"""Headless 2D ball-pit demo — port of the reference example app.

The reference (``examples/main.rs``) runs a specs-ECS ball pit with glium
rendering: Verlet integration + gravity + speed cap (``:334-361``), a
broadphase ``Layer<Index32_2D>`` with ``min_depth=4`` (``:364-374``),
circle-circle narrow phase over ``par_scan`` candidates (``:458-479``),
a per-frame ``pick_ray`` with an exact ray-circle narrow phase
(``:423-456``), positional correction (``:508-511``), wall clamping
(``:513-531``), and a per-frame ``collisions/elapsed`` printout
(``:480-506``).

This port keeps the whole physics step on-device as one jitted function:
broadphase (build + scan) and narrow phase + response are a single XLA
program over fixed-shape arrays.  An optional O(n^2) brute-force mode
replicates the reference's built-in soak-test toggle (``:485-505``), and
``--png`` dumps frames (the headless render story).

Usage:
    python examples/ball_pit.py [--balls 2500] [--frames 300]
        [--brute-force] [--png-every 0] [--seed 0]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from broadphase_tpu import Index32_2D, layer, query

SPEC = Index32_2D
WORLD = 1.0                      # [0, 1]^2 box
GRAVITY = jnp.float32(-0.5)
DT = jnp.float32(1.0 / 100.0)    # reference: 100 Hz fixed step (main.rs:130)
MAX_SPEED = jnp.float32(1.0)     # speed cap (main.rs:352-358)
MIN_DEPTH = 4                    # reference layer config (main.rs:372)


def make_step(n: int, pair_cap: int, brute_force: bool):
    smin = jnp.zeros(2, jnp.float32)
    smax = jnp.full(2, WORLD, jnp.float32)
    obj_ids = jnp.arange(n, dtype=jnp.uint32)

    def _ray_circle_dist(cand_ids, mask, pos, radius, origin, dirn):
        """Exact ray-circle narrow phase (reference main.rs:423-456)."""
        c = pos[cand_ids] - origin[None, :]
        t = jnp.sum(c * dirn[None, :], axis=-1)
        d2 = jnp.sum(c * c, axis=-1) - t * t
        r2 = radius[cand_ids] ** 2
        root = jnp.sqrt(jnp.maximum(r2 - d2, 0.0))
        hit = (d2 <= r2) & (t + root >= 0)
        return jnp.where(hit, t - root, jnp.inf)

    def collide(pos, radius, ray_dir):
        """Candidate pairs -> (i, j, valid) arrays + the pick_ray demo."""
        if brute_force:
            # reference's O(n^2) fallback mode (main.rs:485-505)
            ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n),
                                  indexing="ij")
            mask = ii < jj
            no_pick = (jnp.uint32(0xFFFF_FFFF), jnp.float32(jnp.inf),
                       jnp.bool_(False))
            return (ii.reshape(-1), jj.reshape(-1), mask.reshape(-1),
                    no_pick)
        bmin = pos - radius[:, None]
        bmax = pos + radius[:, None]
        state = layer.build(SPEC, smin, smax, bmin, bmax, obj_ids,
                            min_depth=MIN_DEPTH)
        # pick_ray demo: nearest ball along a sweeping ray from the top
        # center, exact circle narrow phase (main.rs:423-456)
        origin = jnp.asarray([0.5, 1.0], jnp.float32)
        dirn = ray_dir / jnp.linalg.norm(ray_dir)
        state, pick = query.pick_ray(
            SPEC, state, smin, smax, origin, ray_dir, jnp.float32(2.0),
            _ray_circle_dist, (pos, radius, origin, dirn))
        state, res = layer.scan(SPEC, state, pair_cap)
        i = jnp.minimum(res.pairs_a, jnp.uint32(n - 1)).astype(jnp.int32)
        j = jnp.minimum(res.pairs_b, jnp.uint32(n - 1)).astype(jnp.int32)
        valid = jnp.arange(pair_cap) < res.count
        return i, j, valid, (pick.obj_id, pick.distance, pick.found)

    @jax.jit
    def step(pos, prev, radius, ray_dir):
        # Verlet + gravity (main.rs:334-350)
        vel = (pos - prev) / DT
        vel = vel.at[:, 1].add(GRAVITY * DT)
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        vel = jnp.where(speed > MAX_SPEED, vel * (MAX_SPEED / speed), vel)
        new_pos = pos + vel * DT

        # broadphase + circle narrow phase (main.rs:458-479)
        i, j, valid, pick = collide(new_pos, radius, ray_dir)
        d = new_pos[i] - new_pos[j]
        dist = jnp.linalg.norm(d, axis=-1)
        rsum = radius[i] + radius[j]
        hit = valid & (dist < rsum) & (dist > 0)
        # positional correction: push each circle half the overlap apart
        # (main.rs:508-511)
        corr = jnp.where(hit[:, None],
                         d / jnp.maximum(dist, 1e-6)[:, None]
                         * ((rsum - dist) * 0.5)[:, None],
                         0.0)
        new_pos = new_pos.at[i].add(corr, mode="drop")
        new_pos = new_pos.at[j].add(-corr, mode="drop")

        # wall clamp (main.rs:513-531)
        new_pos = jnp.clip(new_pos, radius[:, None],
                           WORLD - radius[:, None])
        return new_pos, pos, jnp.sum(hit.astype(jnp.int32)), pick

    return step


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--balls", type=int, default=2500)  # max in reference
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--brute-force", action="store_true")
    ap.add_argument("--png-every", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    n = args.balls
    rng = np.random.default_rng(args.seed)
    radius = jnp.asarray(rng.uniform(0.004, 0.01, n).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (n, 2)).astype(np.float32))
    prev = pos - jnp.asarray(
        rng.normal(0, 0.001, (n, 2)).astype(np.float32))

    pair_cap = -(-32 * n // 1024) * 1024   # tile-aligned for the TPU kernel
    step = make_step(n, pair_cap=pair_cap, brute_force=args.brute_force)

    def ray_at(frame):
        # sweeping ray from the top center (headless cursor analog)
        a = np.float32(-1.9 + 1.4 * ((frame % 120) / 120.0))
        return jnp.asarray([np.sin(a) * 0.4, np.cos(a)], jnp.float32)

    pos, prev, _, _ = step(pos, prev, radius, ray_at(0))     # compile
    jax.block_until_ready(pos)

    total_col = 0
    t0 = time.perf_counter()
    for frame in range(args.frames):
        fs = time.perf_counter()
        pos, prev, ncol, pick = step(pos, prev, radius, ray_at(frame))
        ncol = int(ncol)
        total_col += ncol
        elapsed = (time.perf_counter() - fs) * 1e6
        if frame % 30 == 0:
            # reference per-frame printout (main.rs:480-506)
            picked = (f"pick id={int(pick[0])} d={float(pick[1]):.3f}"
                      if bool(pick[2]) else "pick miss")
            print(f"frame {frame:4d}: collisions: {ncol:6d} "
                  f"elapsed: {elapsed:9.0f}us  {picked}")
        if args.png_every and frame % args.png_every == 0:
            _render(np.asarray(pos), np.asarray(radius), frame)
    dt = time.perf_counter() - t0
    print(f"{args.frames} frames, {n} balls, "
          f"{dt / args.frames * 1e3:.2f} ms/frame, "
          f"total collisions {total_col}")


def _render(pos, radius, frame):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.set_xlim(0, WORLD)
    ax.set_ylim(0, WORLD)
    ax.set_aspect("equal")
    ax.scatter(pos[:, 0], pos[:, 1],
               s=(radius * 6 * 72) ** 2, alpha=0.6, linewidths=0)
    path = f"ball_pit_{frame:05d}.png"
    fig.savefig(path, dpi=100)
    plt.close(fig)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
