"""Morton-window KNN recall at refine-stage scale (millions of points,
anisotropic density) — the regime where window-based KNN degrades.
Measures recall@k of ops.knn.knn against exact cKDTree on a query sample.
Writes KNN_RECALL.json.

    python scripts/knn_recall.py [--sizes 100000,1000000,2000000]
"""

import argparse
import json

import numpy as np


def aniso_cloud(n, seed=0):
    """Highly anisotropic density: surface shell + dense clusters + sparse
    volume — the refine-stage point distribution."""
    rng = np.random.default_rng(seed)
    n_surf = int(n * 0.6)
    d = rng.normal(size=(n_surf, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    surf = d * (1.0 + 0.05 * rng.normal(size=(n_surf, 1)))
    n_cl = int(n * 0.3)
    centers = rng.uniform(-1, 1, (20, 3))
    cl = centers[rng.integers(0, 20, n_cl)] + rng.normal(
        scale=0.01, size=(n_cl, 3)
    )
    n_sp = n - n_surf - n_cl
    sp = rng.uniform(-3, 3, (n_sp, 3))
    return np.concatenate([surf, cl, sp]).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,1000000,2000000")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--sample", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from scipy.spatial import cKDTree

    from frosting_tpu.ops import knn as knn_lib

    rows = []
    for n in [int(s) for s in args.sizes.split(",")]:
        pts = aniso_cloud(n)
        idx, _d2 = knn_lib.knn(jnp.asarray(pts), k=args.k)
        idx = np.asarray(idx)

        rng = np.random.default_rng(1)
        sample = rng.choice(n, args.sample, replace=False)
        tree = cKDTree(pts)
        _, exact = tree.query(pts[sample], k=args.k + 1, workers=-1)
        exact = exact[:, 1:]  # drop self

        hits = 0
        for i, q in enumerate(sample):
            hits += len(np.intersect1d(idx[q], exact[i]))
        recall = hits / (args.sample * args.k)
        rows.append({"n": n, "k": args.k, "recall": round(recall, 4)})
        print(rows[-1], flush=True)

    with open("KNN_RECALL.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
