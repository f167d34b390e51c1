"""K-means anchor fitting: an on-device JAX implementation
(``kmeans_jax``, the recommended path) plus a NumPy
compatibility/oracle path (``kmeans``).

``kmeans_jax`` runs the assignment/update steps vectorized under jit
— use it for anything large or on-accelerator.

``kmeans`` exists for one purpose: drop-in determinism parity with
the reference (reference utils/kmeans.py:43-102) — the same RNG call
sequence under a seeded ``np.random`` yields the same anchors as a
seeded reference run (random init scaled by the data range,
argmin-assignment, empty clusters re-seeded randomly, loss = mean
distance between consecutive center sets). It is intentionally a
faithful transcription of that 40-line public algorithm so it can
serve as the test oracle and as a bit-compatible migration path; it
is not the performance path.
"""

import numpy as np


def iou(center_boxes, data_boxes):
    """Area-ratio IoU approximation min(area)/max(area)
    (reference kmeans.py:9-24)."""
    center_area = center_boxes[..., 0] * center_boxes[..., 1]
    data_area = data_boxes[..., 0] * data_boxes[..., 1]
    return (np.minimum(center_area, data_area)
            / np.maximum(center_area, data_area))


def iou_dist(center_boxes, data_boxes):
    """1 - IoU (reference kmeans.py:27-33)."""
    return 1 - iou(center_boxes, data_boxes)


def euclidean_dist(center_boxes, data_boxes):
    """L2 distance (reference kmeans.py:36-40)."""
    return np.sqrt(np.sum(np.square(center_boxes - data_boxes), axis=-1))


def kmeans(data, n_cluster, dist_func, stop_dist,
           max_iternum=10000, verbose=True):
    """K-means clustering with a pluggable distance (reference
    kmeans.py:43-102).

    Args:
        data: (num_samples, num_dims) array.
        n_cluster: number of clusters.
        dist_func: distance of (n_cluster, 1, d) centers vs (1, N, d)
            data -> (n_cluster, N).
        stop_dist: stop when mean center displacement falls below this.
        max_iternum: iteration cap.
        verbose: print per-epoch loss.

    Returns:
        (n_cluster, num_dims) float32 centers.
    """
    data = np.asarray(data)
    n_dim = data.shape[-1]
    data = data[None, ...]                       # 1,N,d
    data_max, data_min = data.max(), data.min()

    center = (np.random.rand(n_cluster * n_dim)
              .reshape((n_cluster, 1, n_dim)) * data_max)
    center = center * (data_max - data_min) + data_min

    epoch = 1
    while True:
        assign = np.argmin(dist_func(center, data), axis=0)   # (N,)
        new_center = np.copy(center)
        for n in range(n_cluster):
            members = np.where(assign == n)[0]
            if len(members) > 0:
                new_center[n, 0] = data[0, members].mean(axis=0)
            else:
                new_center[n, 0] = (np.random.rand(n_dim)
                                    * (data_max - data_min) + data_min)
        loss = np.mean(dist_func(center, new_center))
        center = new_center
        if verbose:
            print(f"epoch {epoch:2d}: loss = {loss:.4f}")
        epoch += 1
        if loss < stop_dist or epoch > max_iternum:
            break

    return center.reshape((n_cluster, n_dim)).astype("float32")


def kmeans_jax(data, n_cluster, dist="iou", stop_dist=1e-4,
               max_iternum=1000, seed=0):
    """Vectorized k-means on device: one jit-compiled
    assignment+update step iterated with host-side convergence check.

    ``dist`` is "iou" (anchor fitting) or "euclidean". Empty clusters
    keep their previous center (deterministic, unlike the reference's
    random re-seed) — fine for anchor fitting where k << N.
    """
    import jax
    import jax.numpy as jnp

    data = jnp.asarray(data, jnp.float32)        # N,d
    n, d = data.shape
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, n, (n_cluster,), replace=False)
    center = data[idx]                           # k,d

    def dist_fn(c, x):
        if dist == "iou":
            ca = c[:, None, 0] * c[:, None, 1]   # k,1
            xa = x[None, :, 0] * x[None, :, 1]   # 1,N
            return 1 - jnp.minimum(ca, xa) / jnp.maximum(ca, xa)
        diff = c[:, None, :] - x[None, :, :]
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    @jax.jit
    def step(center):
        assign = jnp.argmin(dist_fn(center, data), axis=0)      # N
        one_hot = jax.nn.one_hot(assign, n_cluster, dtype=jnp.float32)
        counts = one_hot.sum(axis=0)                            # k
        sums = one_hot.T @ data                                 # k,d
        new_center = jnp.where(
            counts[:, None] > 0,
            sums / jnp.maximum(counts[:, None], 1.0),
            center)
        shift = jnp.mean(jnp.abs(new_center - center))
        return new_center, shift

    for _ in range(max_iternum):
        center, shift = step(center)
        if float(shift) < stop_dist:
            break
    return np.asarray(center)
