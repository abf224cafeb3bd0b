"""AOT compilation bundles — serialize whole compiled training programs.

The warm-start anatomy (docs/DESIGN.md "Cold start anatomy") shows that
once XLA's persistent cache covers compilation, the remaining cold cost is
Python **tracing/lowering** of the big fit graphs — which JAX cannot cache
across processes. `jax.export` can: it serializes the lowered StableHLO
(shape-specialized, weights NOT baked in — these are training programs) so
a later process skips flax module construction, tracing, and lowering
entirely; only the XLA compile remains, and that hits the persistent cache.

Use: `export_jitted(jax.jit(make_fit_fn(...)), example_args, path)` once,
then `fn = load_bundle(path); fn(rng, train, evals, cw)` in any process —
same pytree in, same FitResult out.

Custom pytree node types appearing in the signature (FitResult, the fit
carry, optax optimizer states) must be registered with jax.export's
serialization on BOTH sides; `_register_tree_types` walks an example tree
and registers every namedtuple / flax-struct node it finds, and the
framework's standard fit types are registered at import so `load_bundle`
works without having seen the original objects.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import pickle
from pathlib import Path
from typing import Any, Callable

import jax

_REGISTERED: set = set()
_REGISTERED_NAMES: set = set()


def _register_one(cls) -> None:
    from jax import export as jax_export

    if cls in _REGISTERED:
        return
    name = f"{cls.__module__}.{cls.__qualname__}"
    try:
        if isinstance(cls, type) and issubclass(cls, tuple) and hasattr(
                cls, "_fields"):
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=name)
        elif dataclasses.is_dataclass(cls):
            # flax.struct dataclasses flatten to (children, auxdata);
            # auxdata is a small static object — pickle round-trips it
            jax_export.register_pytree_node_serialization(
                cls, serialized_name=name,
                serialize_auxdata=pickle.dumps,
                deserialize_auxdata=pickle.loads)
        else:
            return
    except ValueError as e:
        # only the benign double-registration case may be swallowed;
        # anything else is a genuine registration failure
        msg = str(e).lower()
        if "duplicate" not in msg and "already registered" not in msg:
            raise
    _REGISTERED.add(cls)
    _REGISTERED_NAMES.add(name)


def _register_tree_types(tree: Any) -> set:
    """Register every custom pytree node type reachable in ``tree``.
    Returns the set of serialized names encountered (used to persist the
    bundle's type manifest)."""
    names: set = set()

    def note(cls):
        _register_one(cls)
        names.add(f"{cls.__module__}.{cls.__qualname__}")

    def walk(x):
        if isinstance(x, tuple) and hasattr(x, "_fields"):
            note(type(x))
            for c in x:
                walk(c)
        elif dataclasses.is_dataclass(x) and not isinstance(x, type):
            note(type(x))
            for f in dataclasses.fields(x):
                walk(getattr(x, f.name))
        elif isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, (list, tuple)):
            for v in x:
                walk(v)

    walk(tree)
    return names


def _register_fit_types() -> None:
    """The framework's standard training-program node types, registered
    eagerly so ``load_bundle`` works in a fresh process."""
    import optax

    from multimodal_eeg_fmri_tpu.train.fit import FitResult, _Carry

    for cls in (FitResult, _Carry, optax.EmptyState, optax.ScaleByAdamState,
                optax.ClipByGlobalNormState
                if hasattr(optax, "ClipByGlobalNormState") else
                optax.EmptyState):
        _register_one(cls)


def export_jitted(jitted_fn: Callable, example_args: tuple,
                  path: str | Path | None = None) -> bytes:
    """Serialize a jitted function, specialized to ``example_args``'s
    shapes/dtypes, to a self-contained AOT bundle (StableHLO)."""
    from jax import export as jax_export

    _register_fit_types()
    names = _register_tree_types(example_args)
    # outputs can carry further custom nodes (FitResult, carry, opt state)
    out_shape = jax.eval_shape(jitted_fn, *example_args)
    names |= _register_tree_types(out_shape)

    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_args)
    exp = jax_export.export(jitted_fn)(*spec)
    blob = exp.serialize()
    if path is not None:
        Path(path).write_bytes(blob)
        # type manifest: which custom node registrations a fresh process
        # needs before this bundle can deserialize — load_bundle checks it
        # and fails with an actionable error instead of a pytree crash
        _types_sidecar(path).write_text(json.dumps(sorted(names)))
    return blob


def _types_sidecar(path: str | Path) -> Path:
    return Path(str(path) + ".types.json")


def _strip_addresses(s: str) -> str:
    import re

    return re.sub(r"0x[0-9a-fA-F]+", "0x", s)


def bundle_or_jit(jitted_fn: Callable, example_args: tuple,
                  cache_dir: str | Path, tag: str = "") -> Callable:
    """Transparent AOT bundle cache around a jitted function.

    Key = (tag, jax version, the args' shapes/dtypes/treedef). On a hit,
    returns the deserialized bundle (no tracing); on a miss, exports the
    bundle for next time and returns the live jitted function (which this
    process must trace anyway). ``tag`` must capture everything beyond
    shapes that changes the computation (model + train config reprs).

    The cache is keyed by configuration, NOT by code version — delete the
    directory after changing framework internals.
    """
    import hashlib

    cache_dir = Path(cache_dir)
    cache_dir.mkdir(parents=True, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(example_args)
    sig = "|".join(f"{getattr(x, 'shape', ())}:{getattr(x, 'dtype', type(x).__name__)}"
                   for x in leaves)
    # jax.export bakes the lowering platform and the device assignment into
    # the bundle — the same shapes exported on CPU (or on a different device
    # count) are a DIFFERENT program, so both belong in the key
    key_src = (f"{_strip_addresses(tag)}::{jax.__version__}"
               f"::{jax.default_backend()}::{jax.device_count()}"
               f"::{treedef}::{sig}")
    key = hashlib.sha256(key_src.encode()).hexdigest()[:24]
    path = cache_dir / f"{key}.shlo"
    if path.exists():
        loaded = load_bundle(path)
        fell_back = False  # once stale, stay on the live jit: re-raising
        # through the dead bundle re-ran the full export per call (review)

        def call_with_fallback(*args):
            nonlocal fell_back
            if fell_back:
                return jitted_fn(*args)
            try:
                return loaded(*args)
            except ValueError as e:
                # belt-and-braces: a stale bundle (e.g. cache dir copied
                # across machines) that was lowered for another platform /
                # topology falls back to the live jit and is rewritten ONCE
                msg = str(e).lower()
                if "platform" not in msg and "device" not in msg:
                    raise
                logging.getLogger(__name__).warning(
                    "AOT bundle %s is unusable on this backend (%s); "
                    "re-exporting and running the live jitted function",
                    path, e)
                fell_back = True
                export_jitted(jitted_fn, example_args, path)
                return jitted_fn(*args)

        return call_with_fallback
    export_jitted(jitted_fn, example_args, path)
    return jitted_fn


def load_bundle(path_or_bytes: str | Path | bytes) -> Callable:
    """Load an AOT bundle into a callable. Skips flax module construction,
    tracing, and lowering; the XLA compile of the embedded StableHLO runs
    once per process and hits the persistent compilation cache."""
    from jax import export as jax_export

    _register_fit_types()
    if not isinstance(path_or_bytes, bytes):
        sidecar = _types_sidecar(path_or_bytes)
        if sidecar.exists():
            needed = set(json.loads(sidecar.read_text()))
            missing = needed - _REGISTERED_NAMES
            if missing:
                raise RuntimeError(
                    f"AOT bundle {path_or_bytes} requires pytree node "
                    f"serializations not registered in this process: "
                    f"{sorted(missing)}. Import the defining modules and "
                    "register them (core.aot._register_tree_types on an "
                    "example tree) before load_bundle.")
    blob = (path_or_bytes if isinstance(path_or_bytes, bytes)
            else Path(path_or_bytes).read_bytes())
    exp = jax_export.deserialize(blob)
    return exp.call
