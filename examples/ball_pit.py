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

``--lifecycle`` enables the reference's population Lifecycle system
(``main.rs:281-332``): per frame, balls past their lifetime expire, and up
to ``BALL_COUNT_MAX * step_ms / LIFETIME_MIN_MS`` new balls spawn at the
top with random radius ``exp(U(0.5, 2))`` and lifetime ``U(10 s, 50 s)``,
until the population cap.  TPU-native shape: a fixed-capacity array with
an implicit alive mask (``expires > sim``); dead balls' bounds move
outside the system box so the broadphase build drops them (the layer's
``invalid`` path), and spawns scatter into ``top_k``-selected dead slots —
all inside the same jitted step.

Usage:
    python examples/ball_pit.py [--balls 2500] [--frames 300]
        [--brute-force] [--lifecycle] [--png-every 0] [--seed 0]
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

# Lifecycle constants (main.rs:303-306); lifetimes in seconds of sim time
LIFETIME_MIN = 10.0
LIFETIME_MAX = 50.0
SPAWNS_PER_FRAME = max(1, int(2500 * float(DT) * 1000.0 // (LIFETIME_MIN
                                                            * 1000.0)))


def make_step(n: int, pair_cap: int, brute_force: bool,
              lifecycle: bool = False, frames_per_launch: int = 1):
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

    def collide(pos, radius, ray_dir, alive):
        """Candidate pairs -> (i, j, valid) arrays + the pick_ray demo."""
        if brute_force:
            # reference's O(n^2) fallback mode (main.rs:485-505)
            ii, jj = jnp.meshgrid(jnp.arange(n), jnp.arange(n),
                                  indexing="ij")
            mask = (ii < jj) & alive[ii] & alive[jj]
            no_pick = (jnp.uint32(0xFFFF_FFFF), jnp.float32(jnp.inf),
                       jnp.bool_(False))
            return (ii.reshape(-1), jj.reshape(-1), mask.reshape(-1),
                    no_pick)
        bmin = pos - radius[:, None]
        bmax = pos + radius[:, None]
        # dead balls leave the world: out-of-bounds objects take the
        # layer's invalid path and never enter the tree (the TPU analog of
        # the reference's entity deletion, main.rs:297-301)
        bmin = jnp.where(alive[:, None], bmin, jnp.float32(2.0))
        bmax = jnp.where(alive[:, None], bmax, jnp.float32(3.0))
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

    def lifecycle_update(pos, prev, radius, expires, sim, key):
        """Expire + spawn (reference Lifecycle, main.rs:281-332): balls
        past their lifetime die; up to SPAWNS_PER_FRAME new ones appear at
        the top in top_k-selected dead slots, with exp-distributed radii
        and uniform lifetimes — all fixed-shape."""
        alive = expires > sim
        K = SPAWNS_PER_FRAME
        dead_score, idx = jax.lax.top_k((~alive).astype(jnp.int32), K)
        k1, k2, k4 = jax.random.split(key, 3)
        # radius exp(U(0.5, 2)) in reference pixels, scaled to the unit
        # world (the reference screen is O(800) px)
        r_new = jnp.exp(jax.random.uniform(k1, (K,), jnp.float32,
                                           0.5, 2.0)) / 800.0
        x_new = jax.random.uniform(k2, (K,), jnp.float32) \
            * (1.0 - 2.0 * r_new) + r_new
        y_new = 1.0 - r_new                      # enters at the top edge
        life = jax.random.uniform(k4, (K,), jnp.float32,
                                  LIFETIME_MIN, LIFETIME_MAX)
        ok = dead_score == 1                      # only real dead slots
        p_new = jnp.stack([x_new, y_new], axis=-1)
        sel = jnp.where(ok[:, None], p_new, pos[idx])
        pos = pos.at[idx].set(sel)
        prev = prev.at[idx].set(sel)              # zero initial velocity
        radius = radius.at[idx].set(jnp.where(ok, r_new, radius[idx]))
        expires = expires.at[idx].set(jnp.where(ok, sim + life,
                                                expires[idx]))
        return pos, prev, radius, expires, expires > sim

    def _frame(pos, prev, radius, expires, sim, key):
        # sweeping pick ray from the top center, computed ON DEVICE from
        # the sim clock (a per-frame host-built ray array would cost one
        # h2d transfer per frame — ~ms through this environment's tunnel)
        frame = sim / jnp.float32(DT)
        a = jnp.float32(-1.9) + jnp.float32(1.4) \
            * (jnp.mod(frame, 120.0) / jnp.float32(120.0))
        ray_dir = jnp.stack([jnp.sin(a) * jnp.float32(0.4), jnp.cos(a)])
        if lifecycle:
            pos, prev, radius, expires, alive = lifecycle_update(
                pos, prev, radius, expires, sim, key)
        else:
            alive = jnp.ones((n,), jnp.bool_)

        # Verlet + gravity (main.rs:334-350), frozen for dead slots
        vel = jnp.where(alive[:, None], (pos - prev) / DT, 0.0)
        vel = vel.at[:, 1].add(jnp.where(alive, GRAVITY * DT, 0.0))
        speed = jnp.linalg.norm(vel, axis=-1, keepdims=True)
        vel = jnp.where(speed > MAX_SPEED, vel * (MAX_SPEED / speed), vel)
        new_pos = pos + vel * DT

        # broadphase + circle narrow phase (main.rs:458-479)
        i, j, valid, pick = collide(new_pos, radius, ray_dir, alive)
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
        return (new_pos, pos, radius, expires,
                jnp.sum(hit.astype(jnp.int32)),
                jnp.sum(alive.astype(jnp.int32)), pick)

    if frames_per_launch <= 1:
        return jax.jit(_frame)

    # soak mode: run frames_per_launch frames per dispatch in a device-side
    # lax.scan — through this environment's TPU tunnel every dependent
    # dispatch costs ~20 ms of round-trip latency, which would swamp the
    # ~2 ms of device work per frame; the reference's per-frame printout
    # becomes a per-launch summary
    @jax.jit
    def step_chunk(pos, prev, radius, expires, sim, key):
        def one(carry, _):
            pos, prev, radius, expires, sim, key = carry
            key, sub = jax.random.split(key)
            p2, pr2, r2, e2, ncol, nalive, pick = _frame(
                pos, prev, radius, expires, sim, sub)
            return ((p2, pr2, r2, e2, sim + DT, key),
                    (ncol, nalive, pick[0], pick[1], pick[2]))
        carry, ys = jax.lax.scan(
            one, (pos, prev, radius, expires, sim, key), None,
            length=frames_per_launch)
        p2, pr2, r2, e2, sim2, key2 = carry
        pick_last = (ys[2][-1], ys[3][-1], ys[4][-1])
        return (p2, pr2, r2, e2, jnp.sum(ys[0]), ys[1][-1], pick_last,
                sim2, key2)

    return step_chunk


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--balls", type=int, default=2500)  # max in reference
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--brute-force", action="store_true")
    ap.add_argument("--lifecycle", action="store_true",
                    help="spawn/expire balls per frame (main.rs:281-332)")
    ap.add_argument("--png-every", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=1,
                    help="frames per device launch (lax.scan soak mode; "
                    "1 = the reference's interactive per-frame loop)")
    args = ap.parse_args(argv)

    n = args.balls
    rng = np.random.default_rng(args.seed)
    radius = jnp.asarray(rng.uniform(0.004, 0.01, n).astype(np.float32))
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (n, 2)).astype(np.float32))
    prev = pos - jnp.asarray(
        rng.normal(0, 0.001, (n, 2)).astype(np.float32))
    if args.lifecycle:
        # population ramps from empty, as in the reference
        expires = jnp.zeros((n,), jnp.float32)
    else:
        expires = jnp.full((n,), jnp.inf, jnp.float32)
    key = jax.random.PRNGKey(args.seed)

    pair_cap = -(-32 * n // 1024) * 1024   # tile-aligned for the TPU kernel
    chunk = max(1, args.chunk)
    step = make_step(n, pair_cap=pair_cap, brute_force=args.brute_force,
                     lifecycle=args.lifecycle, frames_per_launch=chunk)

    out = step(pos, prev, radius, expires,
               jnp.float32(0.0), key)                        # compile
    jax.block_until_ready(out[0])

    if chunk > 1:
        col_counts = []
        sim = jnp.float32(0.0)
        t0 = time.perf_counter()
        launches = max(1, args.frames // chunk)
        for li in range(launches):
            fs = time.perf_counter()
            pos, prev, radius, expires, ncol, nalive, pick, sim, key = \
                step(pos, prev, radius, expires, sim, key)
            col_counts.append(ncol)
            if li % 3 == 0:
                picked = (f"pick id={int(pick[0])} d={float(pick[1]):.3f}"
                          if bool(pick[2]) else "pick miss")
                elapsed = (time.perf_counter() - fs) * 1e6
                print(f"frame {li * chunk:4d}: balls: {int(nalive):5d} "
                      f"collisions: {int(ncol):6d} "
                      f"elapsed: {elapsed:9.0f}us  {picked}")
        jax.block_until_ready(pos)
        dt = time.perf_counter() - t0
        total_col = int(np.sum([int(c) for c in col_counts]))
        frames = launches * chunk
        print(f"{frames} frames, {n} ball slots, "
              f"{dt / frames * 1e3:.2f} ms/frame, "
              f"total collisions {total_col}")
        return

    # physics state stays on device; host syncs only on print frames —
    # this environment's tunnel adds ~30 ms per blocking readback, which
    # would otherwise dominate the per-frame cost (the counters are tiny
    # device scalars, collected and summed after the loop)
    col_counts = []
    sim = jnp.float32(0.0)           # device-resident sim clock: a fresh
    #                                  host scalar per frame would cost one
    #                                  h2d transfer per dispatch
    t0 = time.perf_counter()
    for frame in range(args.frames):
        fs = time.perf_counter()
        key, sub = jax.random.split(key)
        pos, prev, radius, expires, ncol, nalive, pick = step(
            pos, prev, radius, expires, sim, sub)
        sim = sim + DT
        col_counts.append(ncol)
        if frame % 30 == 0:
            # reference per-frame printout (main.rs:480-506); forcing the
            # readback here also bounds in-flight work
            picked = (f"pick id={int(pick[0])} d={float(pick[1]):.3f}"
                      if bool(pick[2]) else "pick miss")
            elapsed = (time.perf_counter() - fs) * 1e6
            print(f"frame {frame:4d}: balls: {int(nalive):5d} "
                  f"collisions: {int(ncol):6d} "
                  f"elapsed: {elapsed:9.0f}us  {picked}")
        if args.png_every and frame % args.png_every == 0:
            _render(np.asarray(pos), np.asarray(radius), frame)
    jax.block_until_ready(pos)
    dt = time.perf_counter() - t0
    total_col = int(np.sum([int(c) for c in col_counts]))
    print(f"{args.frames} frames, {n} ball slots, "
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
