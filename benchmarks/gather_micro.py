"""Microbenchmark: variants of the pose-dependent FOV fill gather.

Which formulation does XLA:TPU execute fastest?
  v0: 2D gather from the full map            (current)
  v1: flat 1D gather from the full map
  v2: dynamic-slice a per-robot window, then flat gather from the window
  v3: v2 with the window cast to int32 lanes (4 cells per load)
  v4: one-hot matmul row-gather: rows via matmul, columns via flat gather
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 200          # robots
P = 160_000      # pixels per robot
H = W = 1067     # world map
WIN = 592        # window size (6*sqrt(2) m / 0.015 + margin)


def timeit(fn, *args, iters=10, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {ms:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    world = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    # per-robot window origins + per-pixel offsets within a window
    orig = jnp.asarray(rng.integers(0, H - WIN, (N, 2)), jnp.int32)
    offm = jnp.asarray(rng.integers(0, WIN, (N, P)), jnp.int32)
    offn = jnp.asarray(rng.integers(0, WIN, (N, P)), jnp.int32)
    cm = orig[:, 0:1] + offm
    cn = orig[:, 1:2] + offn

    @jax.jit
    def v0(world, cm, cn):
        return world[cm, cn]

    @jax.jit
    def v1(world, cm, cn):
        flat = world.reshape(-1)
        return flat[cm.astype(jnp.int32) * W + cn]

    @jax.jit
    def v2(world, orig, offm, offn):
        def one(o, om, on):
            win = jax.lax.dynamic_slice(world, (o[0], o[1]), (WIN, WIN))
            return win.reshape(-1)[om * WIN + on]
        return jax.vmap(one)(orig, offm, offn)

    @jax.jit
    def v3(world, orig, offm, offn):
        def one(o, om, on):
            win = jax.lax.dynamic_slice(world, (o[0], o[1]), (WIN, WIN))
            packed = win.reshape(WIN, WIN // 4, 4).astype(jnp.uint32)
            lanes = (packed[..., 0] | (packed[..., 1] << 8)
                     | (packed[..., 2] << 16) | (packed[..., 3] << 24))
            word = lanes.reshape(-1)[om * (WIN // 4) + (on >> 2)]
            return (word >> ((on & 3) * 8)) & 0xFF
        return jax.vmap(one)(orig, offm, offn)

    timeit(v0, world, cm, cn, name="v0: 2D gather, full map")
    timeit(v1, world, cm, cn, name="v1: flat 1D gather, full map")
    timeit(v2, world, orig, offm, offn, name="v2: window slice + flat gather")
    timeit(v3, world, orig, offm, offn, name="v3: window + int32-lane gather")


if __name__ == "__main__":
    main()


def main2():
    rng = np.random.default_rng(0)
    world = jnp.asarray(rng.integers(0, 255, (H, W)), jnp.uint8)
    poses = jnp.asarray(rng.uniform(1, 14, (N, 3)), jnp.float32)
    bx = jnp.asarray(rng.uniform(-3, 3, (P,)), jnp.float32)
    by = jnp.asarray(rng.uniform(-3, 3, (P,)), jnp.float32)
    own = jnp.asarray(rng.integers(0, 2, (N, 64, 64)), bool)
    oorig = jnp.asarray(rng.integers(0, H - 64, (N, 2)), jnp.int32)

    @jax.jit
    def coords_and_world(world, poses):
        def one(pose):
            c, s = jnp.cos(pose[2]), jnp.sin(pose[2])
            wx = c * bx - s * by + pose[0]
            wy = s * bx + c * by + pose[1]
            cm = jnp.where(wx >= 0, jnp.floor(wx / 0.015 + 0.5), jnp.ceil(wx / 0.015 - 0.5)).astype(jnp.int32)
            cn = jnp.where(wy >= 0, jnp.floor(wy / 0.015 + 0.5), jnp.ceil(wy / 0.015 - 0.5)).astype(jnp.int32)
            inside = (cm >= 0) & (cm < H) & (cn >= 0) & (cn < W)
            v = world[jnp.clip(cm, 0, H - 1), jnp.clip(cn, 0, W - 1)]
            return inside & ((v & 1) > 0), cm, cn
        return jax.vmap(one)(poses)

    @jax.jit
    def own_gather(cm, cn, own, oorig):
        def one(cm1, cn1, ol, oo):
            lm = cm1 - oo[0]
            ln = cn1 - oo[1]
            inl = (lm >= 0) & (lm < 64) & (ln >= 0) & (ln < 64)
            return jnp.where(inl, ol[jnp.clip(lm, 0, 63), jnp.clip(ln, 0, 63)], False)
        return jax.vmap(one)(cm, cn, own, oorig)

    occ, cm, cn = coords_and_world(world, poses)
    jax.block_until_ready(occ)
    timeit(coords_and_world, world, poses, name="v5: coords + world gather + mask")
    timeit(own_gather, cm, cn, own, oorig, name="v6: vmapped per-robot own gather")


if __name__ == "__main__":
    main2()
