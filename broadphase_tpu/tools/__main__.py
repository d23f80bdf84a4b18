"""CLI for scene generation, inspection and validation-data pipelines.

TPU-native equivalent of the reference's ``gen_test_data`` binary
(``utils/src/gen_test_data.rs:805-813``): subcommands ``gen_boxes``,
``show`` and ``gen_validation_data``.  The reference's glium GUI viewer is
replaced by a headless PNG render (``show --png``) — the observability
story called for in SURVEY.md §5.

Usage:
    python -m broadphase_tpu.tools gen_boxes --count 10000 \
        --density 0.001 --size 1 10 --seed 0 --out scene.br_scene
    python -m broadphase_tpu.tools show scene.br_scene [--png out.png]
    python -m broadphase_tpu.tools gen_validation_data \
        --in scene.br_scene --out-dir validation/
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def cmd_gen_boxes(args) -> None:
    from ..utils import gen, scene as scene_io

    sc = gen.gen_boxes(count=args.count, density=args.density,
                       size_range=tuple(args.size), seed=args.seed)
    scene_io.save(args.out, sc)
    print(f"wrote {args.out}: {len(sc.ids)} boxes, "
          f"system [{sc.system_min.tolist()}, {sc.system_max.tolist()}]")


def cmd_show(args) -> None:
    """Dump scene info (reference ``show`` CLI path,
    ``gen_test_data.rs:715-736``); optional PNG render of the boxes and
    the selected object's index cells."""
    from ..utils import scene as scene_io

    sc = scene_io.load(args.path)
    print(f"system_bounds: {sc.system_min.tolist()} .. "
          f"{sc.system_max.tolist()}")
    print(f"objects: {len(sc.ids)}")
    print(f"layer: min_depth={sc.layer.min_depth} "
          f"tree_len={len(sc.layer.ids)} sorted={sc.layer.sorted}")
    print(f"collisions: {len(sc.collisions)}")
    if args.verbose:
        for i in range(min(len(sc.ids), args.limit)):
            print(f"  obj {sc.ids[i]}: {sc.bounds_min[i].tolist()} .. "
                  f"{sc.bounds_max[i].tolist()}")
        for i in range(min(len(sc.layer.ids), args.limit)):
            print(f"  cell {sc.layer.keys[i]:#018x} -> id "
                  f"{sc.layer.ids[i]}")
    if args.png:
        _render_png(sc, args.png, args.select)


def _render_png(sc, path: str, select: int = -1) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Rectangle

    fig, ax = plt.subplots(figsize=(10, 10))
    ax.set_xlim(sc.system_min[0], sc.system_max[0])
    ax.set_ylim(sc.system_min[1], sc.system_max[1])
    ax.set_aspect("equal")
    for i in range(len(sc.ids)):
        sel = int(sc.ids[i]) == select
        ax.add_patch(Rectangle(
            (sc.bounds_min[i, 0], sc.bounds_min[i, 1]),
            sc.bounds_max[i, 0] - sc.bounds_min[i, 0],
            sc.bounds_max[i, 1] - sc.bounds_min[i, 1],
            fill=sel, linewidth=0.4,
            edgecolor="tab:red" if sel else "tab:blue",
            facecolor="tab:red" if sel else "none", alpha=0.8))
    if select >= 0 and len(sc.layer.ids):
        # render the selected object's index cells (reference
        # gen_test_data.rs:383-393): cell -> local bounds -> global
        from ..utils import oracle
        from ..index import Index64_3D
        for k, oid in zip(sc.layer.keys, sc.layer.ids):
            if int(oid) != select:
                continue
            origin = oracle.origin_of(Index64_3D, int(k))
            depth = oracle.depth_of(Index64_3D, int(k))
            if depth == 0:
                lo = [0, 0]
                hi = [0xFFFF_FFFF] * 2
            else:
                scale = oracle.scale_at_depth(depth)
                lo = list(origin[:2])
                hi = [o + scale - 1 for o in origin[:2]]
            glo = oracle.to_global(sc.system_min, sc.system_max,
                                   np.array(lo + [0], np.uint32))
            ghi = oracle.to_global(sc.system_min, sc.system_max,
                                   np.array(hi + [0], np.uint32))
            ax.add_patch(Rectangle(
                (glo[0], glo[1]), ghi[0] - glo[0], ghi[1] - glo[1],
                fill=False, linewidth=1.0, edgecolor="tab:green"))
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print(f"wrote {path}")


def cmd_gen_validation_data(args) -> None:
    """Golden pipeline (reference ``gen_validation_data``,
    ``gen_test_data.rs:740-786``): load input -> extend -> save
    0_layer_unsorted -> sort -> save 1_layer_sorted -> scan -> save
    2_layer_collisions.  Uses the native C++ oracle when available (exact
    reference append order), else the Python oracle."""
    from ..utils import scene as scene_io

    sc = scene_io.load(getattr(args, "in"))
    try:
        from ..utils import native
        keys, ids, _ = native.extend(sc.system_min, sc.system_max,
                                     sc.bounds_min, sc.bounds_max, sc.ids,
                                     min_depth=0)
        skeys, sids = native.sort_tree(keys, ids)
        pairs = native.scan_seq(skeys, sids)
    except Exception:
        from ..utils import oracle
        from ..index import Index64_3D
        k, i, _ = oracle.extend(Index64_3D, sc.system_min, sc.system_max,
                                sc.bounds_min, sc.bounds_max, sc.ids)
        keys = np.array(k, np.uint64)
        ids = np.array(i, np.uint32)
        sk, si = oracle.sort_tree(k, i)
        skeys = np.array(sk, np.uint64)
        sids = np.array(si, np.uint32)
        pairs = np.array(oracle.scan(Index64_3D, sk, si),
                         np.uint32).reshape(-1, 2)

    os.makedirs(args.out_dir, exist_ok=True)

    sc.layer = scene_io.SceneLayer(0, keys, ids, sorted=False)
    scene_io.save(os.path.join(args.out_dir, "0_layer_unsorted.br_scene"),
                  sc)
    sc.layer = scene_io.SceneLayer(0, skeys, sids, sorted=True)
    scene_io.save(os.path.join(args.out_dir, "1_layer_sorted.br_scene"), sc)
    sc.collisions = np.asarray(pairs, np.uint32).reshape(-1, 2)
    scene_io.save(os.path.join(args.out_dir,
                               "2_layer_collisions.br_scene"), sc)
    print(f"wrote 3 validation scenes to {args.out_dir} "
          f"(tree={len(sids)}, pairs={len(pairs)})")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="broadphase_tpu.tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen_boxes", help="generate a deterministic scene")
    g.add_argument("--count", type=int, default=None)
    g.add_argument("--density", type=float, default=None)
    g.add_argument("--size", type=float, nargs=2, default=[1.0, 10.0])
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--out", required=True)
    g.set_defaults(fn=cmd_gen_boxes)

    s = sub.add_parser("show", help="inspect a BR_SCENE file")
    s.add_argument("path")
    s.add_argument("--verbose", action="store_true")
    s.add_argument("--limit", type=int, default=20)
    s.add_argument("--png", default=None)
    s.add_argument("--select", type=int, default=-1)
    s.set_defaults(fn=cmd_show)

    v = sub.add_parser("gen_validation_data",
                       help="derive golden layer/collision scenes")
    v.add_argument("--in", dest="in", required=True)
    v.add_argument("--out-dir", required=True)
    v.set_defaults(fn=cmd_gen_validation_data)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
