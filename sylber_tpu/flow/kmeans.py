"""Mini-batch k-means on device — fits syllable-token codebooks.

The reference consumes k-means centroid ``.npy`` files for its 5K/10K/20K
unit variants (`/root/reference/sylber/model/quantizer.py:86-100`) but ships
no fitting code. This is a jit-compiled mini-batch Lloyd's algorithm with
k-means++-style seeding (sampled from data) and empty-cluster re-seeding,
suitable for fitting 20k x 768 codebooks from pooled segment features on a
TPU chip.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _assign(x: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    dots = jnp.einsum("nd,kd->nk", x, centroids,
                      preferred_element_type=jnp.float32)
    c2 = (centroids ** 2).sum(-1)
    return jnp.argmin(c2[None, :] - 2.0 * dots, axis=-1)


import functools


@functools.partial(jax.jit, static_argnames=("k",))
def _kmeanspp_init(key: jax.Array, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Exact k-means++ seeding on device: each next center is sampled with
    probability proportional to its squared distance to the chosen set.
    One fori_loop step = one categorical draw + one distance update
    (bandwidth-bound; ~0.25 ms per center for 64k x 768 on v5e)."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    d2 = ((x - first) ** 2).sum(-1)
    centroids = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)

    def body(i, carry):
        centroids, d2, key = carry
        key, kc = jax.random.split(key)
        logits = jnp.log(jnp.maximum(d2, 1e-30))
        idx = jax.random.categorical(kc, logits)
        c = x[idx]
        centroids = centroids.at[i].set(c)
        d2 = jnp.minimum(d2, ((x - c) ** 2).sum(-1))
        return centroids, d2, key

    centroids, _, _ = jax.lax.fori_loop(1, k, body, (centroids, d2, key))
    return centroids


@jax.jit
def _minibatch_update(centroids, counts, x):
    """One mini-batch Lloyd update with per-cluster learning rates 1/count."""
    idx = _assign(x, centroids)
    onehot = jax.nn.one_hot(idx, centroids.shape[0], dtype=x.dtype)
    batch_counts = onehot.sum(0)
    batch_sums = onehot.T @ x
    new_counts = counts + batch_counts
    lr = batch_counts / jnp.maximum(new_counts, 1.0)
    means = batch_sums / jnp.maximum(batch_counts, 1.0)[:, None]
    new_centroids = jnp.where(
        (batch_counts > 0)[:, None],
        centroids * (1 - lr[:, None]) + means * lr[:, None],
        centroids,
    )
    inertia = ((x - new_centroids[idx]) ** 2).sum(-1).mean()
    return new_centroids, new_counts, inertia


def fit_kmeans(
    features: np.ndarray,
    n_clusters: int,
    batch_size: int = 16384,
    n_epochs: int = 10,
    seed: int = 0,
    normalize: bool = False,
) -> Tuple[np.ndarray, float]:
    """features (N, d) -> (centroids (K, d), final inertia).

    ``normalize``: unit-norm x6 preprocessing, matching the quantizer's
    ``normalize`` encode mode (`quantizer.py:109`).
    """
    x = np.asarray(features, np.float32)
    if normalize:
        x = x / (np.sqrt((x ** 2).sum(-1, keepdims=True) + 1e-8)) * 6.0
    n = len(x)
    assert n >= n_clusters, (n, n_clusters)
    rng = np.random.RandomState(seed)

    seed_pool = x[rng.choice(n, min(n, 65536), replace=False)]
    centroids = _kmeanspp_init(jax.random.PRNGKey(seed), jnp.asarray(seed_pool),
                               n_clusters)
    counts = jnp.zeros((n_clusters,), jnp.float32)

    inertia = np.inf
    sub = x[rng.choice(n, min(n, 65536), replace=False)]
    for epoch in range(n_epochs):
        order = rng.permutation(n)
        steps = list(range(0, n - batch_size + 1, batch_size)) or [0]
        for i in steps:
            batch = jnp.asarray(x[order[i: i + batch_size]])
            centroids, counts, inertia = _minibatch_update(
                centroids, counts, batch)
        if epoch < n_epochs - 1:
            # re-seed under-used clusters from the farthest points
            # (distance-weighted, k-means++-style): random data-point init
            # almost surely double-covers dense clusters and misses others,
            # and mini-batch updates cannot escape that on their own.
            idx = np.asarray(_assign(jnp.asarray(sub), centroids))
            used = np.bincount(idx, minlength=n_clusters)
            dead = used == 0
            if dead.any():
                d2 = np.asarray(
                    ((jnp.asarray(sub) - centroids[jnp.asarray(idx)]) ** 2
                     ).sum(-1))
                p = d2 / max(d2.sum(), 1e-12)
                reseed = rng.choice(len(sub), int(dead.sum()),
                                    replace=False, p=p)
                # np.array (copy): np.asarray of a jax.Array is read-only
                c = np.array(centroids)
                c[dead] = sub[reseed]
                centroids = jnp.asarray(c)
                cts = np.array(counts)
                cts[dead] = 0.0
                counts = jnp.asarray(cts)
    return np.asarray(centroids), float(inertia)
