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
    if args.html:
        _render_html(sc, args.html)


def _cell_rect_xy(spec, key: int, system_min, system_max):
    """XY-projected global bounds of one cell key (shared by the PNG and
    HTML renders — keep the quantized-cell geometry in ONE place)."""
    from ..utils import oracle

    depth = oracle.depth_of(spec, key)
    origin = oracle.origin_of(spec, key)
    if depth == 0:
        lo, hi = [0, 0], [0xFFFF_FFFF] * 2
    else:
        scale = oracle.scale_at_depth(depth)
        lo = list(origin[:2])
        hi = [o + scale - 1 for o in origin[:2]]
    glo = oracle.to_global(system_min, system_max,
                           np.array(lo + [0], np.uint32))
    ghi = oracle.to_global(system_min, system_max,
                           np.array(hi + [0], np.uint32))
    return float(glo[0]), float(glo[1]), float(ghi[0]), float(ghi[1])


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
        from ..index import Index64_3D
        for k, oid in zip(sc.layer.keys, sc.layer.ids):
            if int(oid) != select:
                continue
            x0, y0, x1, y1 = _cell_rect_xy(Index64_3D, int(k),
                                           sc.system_min, sc.system_max)
            ax.add_patch(Rectangle(
                (x0, y0), x1 - x0, y1 - y0,
                fill=False, linewidth=1.0, edgecolor="tab:green"))
    fig.savefig(path, dpi=120, bbox_inches="tight")
    print(f"wrote {path}")


def _render_html(sc, path: str) -> None:
    """Self-contained interactive scene inspector (XY projection).

    The headless-environment analog of the reference's glium GUI
    (``utils/src/gen_test_data.rs:171-738``): click a cell to select it
    (click again to CYCLE through overlapping cells under the cursor,
    the GUI's selection cycling), and scrub the step slider to replay
    the sequential stack sweep live (``examples/main.rs:898-1028``) —
    the sweep is re-run in the page from embedded per-element events, so
    any step is reachable.  No network, no dependencies: one HTML file.
    """
    import json

    from ..index import Index64_3D
    from ..utils import oracle

    spec = Index64_3D
    if len(sc.layer.ids):
        keys = [int(k) for k in sc.layer.keys]
        tids = [int(i) for i in sc.layer.ids]
        if not sc.layer.sorted:
            keys, tids = oracle.sort_tree(keys, tids)
    else:
        keys, tids, _ = oracle.extend(spec, sc.system_min, sc.system_max,
                                      sc.bounds_min, sc.bounds_max, sc.ids,
                                      min_depth=int(sc.layer.min_depth))
        keys, tids = oracle.sort_tree(keys, tids)
    n = len(keys)
    if n > 50_000:
        print(f"warning: {n} tree entries — the HTML will be large")

    def cell_rect(k):
        return list(_cell_rect_xy(spec, k, sc.system_min, sc.system_max))

    # replay the sweep (src/layer.rs:550-573) recording per-element events
    stack = []                    # element indices
    events = []
    for i in range(n):
        pops = 0
        while stack and not oracle.overlaps(spec, keys[i], keys[stack[-1]]):
            stack.pop()
            pops += 1
        skipped = any(tids[j] == tids[i] for j in stack)
        partners = [] if skipped else \
            [j for j in stack if tids[j] != tids[i]]
        events.append([pops, int(skipped), partners])
        if not skipped:
            stack.append(i)

    data = {
        "sys": [float(sc.system_min[0]), float(sc.system_min[1]),
                float(sc.system_max[0]), float(sc.system_max[1])],
        "objs": [[int(sc.ids[i]),
                  float(sc.bounds_min[i, 0]), float(sc.bounds_min[i, 1]),
                  float(sc.bounds_max[i, 0]), float(sc.bounds_max[i, 1])]
                 for i in range(len(sc.ids))],
        "cells": [[tids[i], cell_rect(keys[i]),
                   f"{keys[i]:#018x}", oracle.depth_of(spec, keys[i])]
                  for i in range(n)],
        "events": events,
    }
    html = _HTML_TEMPLATE.replace("__DATA__", json.dumps(data))
    with open(path, "w") as f:
        f.write(html)
    print(f"wrote {path} ({n} cells, {len(sc.ids)} objects)")


_HTML_TEMPLATE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>broadphase_tpu inspector</title>
<style>
 body{font:13px sans-serif;margin:0;display:flex;height:100vh}
 #view{flex:1}
 #side{width:300px;padding:10px;overflow:auto;border-left:1px solid #ccc}
 svg{width:100%;height:100%;background:#fafafa}
 .obj{fill:none;stroke:#9ab;stroke-width:1;vector-effect:non-scaling-stroke}
 .cell{stroke:#678;stroke-width:.5;cursor:pointer;
       vector-effect:non-scaling-stroke}
 .pending{fill:#4878d0;fill-opacity:.25}
 .stack{fill:#2ca02c;fill-opacity:.55}
 .dropped{fill:#999;fill-opacity:.3}
 .current{fill:#d62728;fill-opacity:.8}
 .partner{fill:#ff7f0e;fill-opacity:.8}
 .skipped{fill:#9467bd;fill-opacity:.7}
 .selected{stroke:#000;stroke-width:.4}
 #bar{position:absolute;left:10px;top:8px;background:#fffc;padding:6px;
      border:1px solid #ccc;border-radius:4px}
 input[type=range]{width:320px;vertical-align:middle}
</style></head><body>
<div id="view">
 <div id="bar">
  step <input id="step" type="range" min="0" value="0">
  <span id="stepn"></span>
  <button onclick="bump(-1)">-1</button><button onclick="bump(1)">+1</button>
 </div>
 <svg id="svg" preserveAspectRatio="xMidYMid meet"></svg>
</div>
<div id="side"><h3>broadphase_tpu inspector</h3>
 <p>Scrub the slider to replay the stack sweep
 (green&nbsp;stack, red&nbsp;current, orange&nbsp;partners,
 purple&nbsp;skipped&nbsp;dup-id, grey&nbsp;dropped).
 Click a cell to select; click the same spot again to cycle through
 overlapping cells.</p><div id="info">nothing selected</div></div>
<script>
const D = __DATA__;
const svg = document.getElementById("svg");
const [sx0, sy0, sx1, sy1] = D.sys;
svg.setAttribute("viewBox", `${sx0} ${sy0} ${sx1-sx0} ${sy1-sy0}`);
const NS = "http://www.w3.org/2000/svg";
function rect(x0,y0,x1,y1,cls){
  const r = document.createElementNS(NS, "rect");
  r.setAttribute("x",x0); r.setAttribute("y",y0);
  r.setAttribute("width",Math.max(x1-x0,1e-6));
  r.setAttribute("height",Math.max(y1-y0,1e-6));
  r.setAttribute("class",cls); svg.appendChild(r); return r;
}
for (const [,x0,y0,x1,y1] of D.objs) rect(x0,y0,x1,y1,"obj");
const cellEls = D.cells.map(([id,[x0,y0,x1,y1]]) => rect(x0,y0,x1,y1,"cell pending"));
const n = D.cells.length;
const slider = document.getElementById("step");
slider.max = n;
let selected = -1, lastKey = null, cycle = 0;
function stateAt(step){  // replay events 0..step-1
  const role = new Array(n).fill("pending"); const stack = [];
  for (let i = 0; i < step; i++){
    const [pops, skipped, partners] = D.events[i];
    for (let p = 0; p < pops; p++) role[stack.pop()] = "dropped";
    if (i === step-1) for (const j of partners) role[j] = "partner";
    if (skipped) role[i] = "skipped";
    else { stack.push(i); role[i] = i === step-1 ? "current" : "stack"; }
  }
  for (const j of stack) if (role[j] !== "current" && role[j] !== "partner")
    role[j] = "stack";
  return role;
}
function redraw(){
  const step = +slider.value;
  document.getElementById("stepn").textContent = `${step}/${n}`;
  const role = stateAt(step);
  cellEls.forEach((el,i) => {
    el.setAttribute("class",
      "cell " + role[i] + (i === selected ? " selected" : ""));
  });
}
function bump(d){ slider.value = Math.min(n, Math.max(0, +slider.value + d));
                  redraw(); }
slider.addEventListener("input", redraw);
svg.addEventListener("click", ev => {
  const pt = svg.createSVGPoint(); pt.x = ev.clientX; pt.y = ev.clientY;
  const p = pt.matrixTransform(svg.getScreenCTM().inverse());
  const hits = [];
  D.cells.forEach(([id,[x0,y0,x1,y1]],i) => {
    if (p.x >= x0 && p.x <= x1 && p.y >= y0 && p.y <= y1) hits.push(i);
  });
  if (!hits.length){ selected = -1; lastKey = null; redraw(); return; }
  // cycling keys off the HIT SET, not the exact point — pixel drift or
  // fractional client coords must not break "click again to cycle"
  const k = hits.join(",");
  cycle = k === lastKey ? (cycle + 1) % hits.length : 0;
  lastKey = k; selected = hits[cycle];
  const [id, box, key, depth] = D.cells[selected];
  // final-state partners of this id, aggregated from every emission
  const ids = new Set();
  D.events.forEach(([,,partners],i) => {
    const a = D.cells[i][0];
    for (const j of partners){ const b = D.cells[j][0];
      if (a === id) ids.add(b); if (b === id) ids.add(a); }
  });
  document.getElementById("info").innerHTML =
    `<b>cell ${selected}</b> (click again to cycle ${hits.length})<br>` +
    `object id ${id}<br>key ${key}<br>depth ${depth}<br>` +
    `collides with: ${[...ids].sort((a,b)=>a-b).join(", ") || "nothing"}`;
  redraw();
});
redraw();
</script></body></html>
"""


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
    s.add_argument("--html", default=None,
                   help="write a self-contained interactive inspector "
                        "(selection cycling + live sweep stepping)")
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
