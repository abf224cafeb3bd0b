"""Ensemble uncertainty decomposition (predictive / aleatoric / epistemic).

The framework already serves K fold models as one vmapped forward
(`serving.EnsemblePredictor(reduce="none")`); their DISAGREEMENT is the
standard epistemic-uncertainty signal the reference never surfaces. For a
clinical triage queue, "the members disagree" (epistemic — more data or a
better model would help) and "the case is genuinely ambiguous" (aleatoric)
demand different actions; this module separates them:

- predictive entropy  H[ mean_k p_k ]          — total uncertainty
- expected entropy    mean_k H[p_k]            — aleatoric part
- mutual information  BALD = predictive − expected — epistemic part
  (Houlsby et al. 2011; ≥ 0 by Jensen, 0 iff all members agree)
- ``disagreement``: fraction of members whose argmax differs from the
  ensemble vote — the blunt-but-readable version of the same signal.

Pure jnp, natural-log entropies, weight-mask-free (these are per-example
quantities; mask downstream like any other per-row output).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _entropy(p: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    p = p.astype(jnp.float32)
    return -jnp.sum(p * jnp.log(jnp.clip(p, 1e-12, 1.0)), axis=axis)


def ensemble_uncertainty(member_probs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Decompose uncertainty of (K, n, C) member probabilities.

    Returns per-example arrays (n,): ``predictive_entropy``,
    ``expected_entropy``, ``mutual_information`` (BALD, clipped at 0
    against float round-off), and ``disagreement``.
    """
    member_probs = member_probs.astype(jnp.float32)
    mean_p = jnp.mean(member_probs, axis=0)            # (n, C)
    predictive = _entropy(mean_p)
    expected = jnp.mean(_entropy(member_probs), axis=0)
    bald = jnp.maximum(predictive - expected, 0.0)
    vote = jnp.argmax(mean_p, axis=-1)                 # (n,)
    member_votes = jnp.argmax(member_probs, axis=-1)   # (K, n)
    disagreement = jnp.mean(
        (member_votes != vote[None, :]).astype(jnp.float32), axis=0)
    return {
        "predictive_entropy": predictive,
        "expected_entropy": expected,
        "mutual_information": bald,
        "disagreement": disagreement,
    }
