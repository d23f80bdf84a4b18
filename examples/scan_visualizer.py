"""Scan-step visualizer: render the stack sweep state per element.

Port of the reference's GUI scan-step visualizer (``examples/main.rs:
898-1028``), which replays the sequential ``scan_impl`` stack sweep and
colors each element by its role at the selected step:

* green  — on the stack (an ancestor of the current element)
* red    — the current element
* orange — collision partners emitted at this step
* grey   — dropped from the stack (passed)
* blue   — not yet visited

Headless: writes PNG frames of a 2D scene.  Useful for debugging the Morton
order / descendant-run invariant that the TPU scan kernel relies on.

Usage:
    python examples/scan_visualizer.py --boxes 40 --steps 0 10 20 --out-dir .
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from broadphase_tpu import Index32_2D
from broadphase_tpu.utils import oracle

SPEC = Index32_2D


def sweep_states(keys, ids, step_limit):
    """Replay scan_impl (src/layer.rs:550-573), returning per-element roles
    after `step_limit` elements have been processed."""
    n = len(keys)
    role = ["pending"] * n          # pending / stack / dropped / current
    stack = []                      # element indices
    emitted = set()
    for idx in range(min(step_limit + 1, n)):
        key, oid = keys[idx], ids[idx]
        while stack and not oracle.overlaps(SPEC, key, keys[stack[-1]]):
            role[stack.pop()] = "dropped"
        if idx == step_limit:
            role[idx] = "current"
            if any(ids[s] == oid for s in stack):
                break
            for s in stack:
                if ids[s] != oid:
                    emitted.add(s)
            break
        if any(ids[s] == oid for s in stack):
            role[idx] = "dropped"
            continue
        stack.append(idx)
    for s in stack:
        if role[s] == "pending":
            role[s] = "stack"
    return role, emitted


def render(sc_bounds, keys, ids, role, emitted, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    (smin, smax, bmin, bmax, obj_ids) = sc_bounds
    colors = {"pending": "tab:blue", "stack": "tab:green",
              "dropped": "lightgrey", "current": "tab:red"}
    fig, ax = plt.subplots(figsize=(9, 9))
    ax.set_xlim(smin[0], smax[0])
    ax.set_ylim(smin[1], smax[1])
    ax.set_aspect("equal")
    by_id = {int(v): k for k, v in enumerate(obj_ids)}
    for e, (key, oid) in enumerate(zip(keys, ids)):
        k = by_id[int(oid)]
        c = "tab:orange" if e in emitted else colors[role[e]]
        ax.add_patch(Rectangle(
            (bmin[k][0], bmin[k][1]),
            bmax[k][0] - bmin[k][0], bmax[k][1] - bmin[k][1],
            fill=True, alpha=0.45, facecolor=c, edgecolor="black",
            linewidth=0.5))
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--boxes", type=int, default=40)
    ap.add_argument("--steps", type=int, nargs="+", default=[0, 5, 15])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", default=".")
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    n = args.boxes
    smin = np.zeros(2, np.float32)
    smax = np.full(2, 100.0, np.float32)
    size = rng.uniform(4, 18, (n, 2)).astype(np.float32)
    bmin = rng.uniform(0, 80, (n, 2)).astype(np.float32)
    bmax = np.minimum(bmin + size, 99.9).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)

    os.makedirs(args.out_dir, exist_ok=True)
    keys, tids, _ = oracle.extend(SPEC, smin, smax, bmin, bmax, ids)
    keys, tids = oracle.sort_tree(keys, tids)
    for step in args.steps:
        role, emitted = sweep_states(keys, tids, step)
        render((smin, smax, bmin, bmax, ids), keys, tids, role, emitted,
               os.path.join(args.out_dir, f"scan_step_{step:04d}.png"))


if __name__ == "__main__":
    main()
