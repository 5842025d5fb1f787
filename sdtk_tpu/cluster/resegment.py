"""HMM/Viterbi resegmentation over window posteriors.

Standard post-clustering DER reducer (the VBx-family idea, simplified):
treat the clustered speakers as HMM states, score each window against the
speaker centroids (scaled-cosine log-likelihoods), and decode the
maximum-a-posteriori state path with a sticky transition prior.  Isolated
single-window label flips — the dominant spectral-clustering error mode on
hop-overlapped windows — are smoothed away because a flip costs two
transition penalties.

TPU-native: the forward pass is one ``lax.scan`` over time with a (K,)
state vector; centroid scoring is a single matmul.  No Python loops over
windows.  (The reference has no equivalent — diarization happens inside
the Speechmatics cloud, speechmatics_backend.py:361-489.)
"""

from __future__ import annotations

import numpy as np


def _viterbi_numpy(
    log_lik: np.ndarray, n_states: int, stay_logprob: float,
    switch_logprob: float
) -> np.ndarray:
    """Host fast path — for typical window counts a device round-trip (and
    a jit compile in a fresh CLI process) costs far more than the decode."""
    t_len = len(log_lik)
    trans = np.full((n_states, n_states), switch_logprob)
    np.fill_diagonal(trans, stay_logprob)
    alpha = log_lik[0].copy()
    backptrs = np.empty((t_len - 1, n_states), dtype=np.int64)
    for t in range(1, t_len):
        scores = alpha[:, None] + trans  # (from, to)
        backptrs[t - 1] = scores.argmax(axis=0)
        alpha = scores.max(axis=0) + log_lik[t]
    path = np.empty(t_len, dtype=np.int64)
    path[-1] = int(alpha.argmax())
    for t in range(t_len - 2, -1, -1):
        path[t] = backptrs[t][path[t + 1]]
    return path


def _viterbi_jax_fn(n_states: int, stay_logprob: float, switch_logprob: float):
    import jax
    import jax.numpy as jnp

    trans = jnp.full((n_states, n_states), switch_logprob)
    trans = trans.at[jnp.arange(n_states), jnp.arange(n_states)].set(stay_logprob)

    @jax.jit
    def decode(log_lik):
        def step(alpha, ll):
            # alpha: (K,) best log-score ending in each state
            scores = alpha[:, None] + trans  # (from, to)
            best_prev = jnp.argmax(scores, axis=0)  # (K,)
            alpha_next = jnp.max(scores, axis=0) + ll
            return alpha_next, best_prev

        alpha_final, backptrs = jax.lax.scan(step, log_lik[0], log_lik[1:])
        last = jnp.argmax(alpha_final)

        # Backtrace: backptrs[t] maps state at time t+1 → best state at
        # time t.  The reverse scan emits states T-1..1 (stacked forward)
        # and its final carry is the state at time 0.
        def back(state, bp):
            return bp[state], state

        first, path_tail = jax.lax.scan(back, last, backptrs, reverse=True)
        return jnp.concatenate([first[None], path_tail])

    return decode


def viterbi_decode(
    log_lik, n_states: int, stay_logprob: float = -0.1,
    switch_logprob: float = -3.0
):
    """(T, K) log-likelihoods → (T,) MAP state path.

    Sticky transition matrix: log p(stay) = ``stay_logprob``,
    log p(switch to any other state) = ``switch_logprob`` (unnormalized is
    fine for MAP decoding).  NumPy under ~16k windows (hour-scale at
    0.75 s hop), ``lax.scan`` on device beyond.
    """
    ll = np.asarray(log_lik, dtype=np.float32)
    if len(ll) < (1 << 14):
        return _viterbi_numpy(ll, n_states, stay_logprob, switch_logprob)
    from ..utils import jaxcache

    jaxcache.enable()
    import jax.numpy as jnp

    fn = _viterbi_jax_fn(n_states, stay_logprob, switch_logprob)
    return np.asarray(fn(jnp.asarray(ll)))


def resegment(
    emb: np.ndarray, labels: np.ndarray, n_speakers: int,
    scale: float = 10.0, stay_logprob: float = -0.1,
    switch_logprob: float = -3.0,
) -> np.ndarray:
    """Refine window labels with a sticky-HMM Viterbi pass.

    Args:
        emb: (N, D) window embeddings (need not be normalized).
        labels: (N,) initial cluster assignment.
        n_speakers: number of clusters K.
        scale: cosine→log-likelihood temperature.

    Returns:
        (N,) refined labels.  Falls back to the input labels for K < 2.
    """
    if n_speakers < 2 or len(labels) < 3:
        return labels
    e = emb / np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    centroids = np.stack(
        [
            e[labels == k].mean(axis=0)
            if np.any(labels == k)
            else np.zeros(e.shape[1])
            for k in range(n_speakers)
        ]
    )
    centroids /= np.maximum(
        np.linalg.norm(centroids, axis=-1, keepdims=True), 1e-12
    )
    log_lik = scale * (e @ centroids.T)  # (N, K)
    path = viterbi_decode(
        log_lik, n_speakers,
        stay_logprob=stay_logprob, switch_logprob=switch_logprob,
    )
    return np.asarray(path)
