"""Measure the physical cost of (N, 3) particle-array layouts on TPU.

The repo's design rule says any (M, small) array tile-pads its minor dim to
128 lanes (~42x physical inflation for f32 (N, 3)).  The step's Euler
update / wrap tail and the u accumulation run on (N, 3) arrays
(integrator.py step_impl, box.wrap) — this tool times the SAME update
chain in three layouts to decide whether State should carry components
separately (VERDICT r3 item 4):

  * n3:   (N, 3) arrays, the current State layout
  * 3n:   (3, N) arrays (sublane pad 3 -> 8, ~2.7x)
  * comp: three (N,) arrays (no padding)

Each chain is a 200-iteration lax.scan of: vel = u + shear*y_hat trick,
pos += vel*dt, wrap (floor shifts, image update) — matching step_impl's
tail op-for-op.  Run alone (one TPU process at a time).
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n = args.n
    L = 97.6
    lo = -L / 2
    tilt = 0.1
    dt = jnp.float32(1e-3)
    rate = jnp.float32(0.05)

    rng = np.random.default_rng(0)
    pos = rng.uniform(-L / 2, L / 2, size=(n, 3)).astype(np.float32)
    u = rng.normal(size=(n, 3)).astype(np.float32)
    img = np.zeros((n, 3), np.int32)

    def wrap_comp(x, y, z, ix, iy, iz):
        sz = jnp.floor((z - lo) / L).astype(jnp.int32)
        z = z - L * sz.astype(jnp.float32)
        sy = jnp.floor((y - lo) / L).astype(jnp.int32)
        y = y - L * sy.astype(jnp.float32)
        x = x - tilt * L * sy.astype(jnp.float32)
        sx = jnp.floor((x - lo - tilt * y) / L).astype(jnp.int32)
        x = x - L * sx.astype(jnp.float32)
        return x, y, z, ix + sx, iy + sy, iz + sz

    @jax.jit
    def run_n3(pos, img, u):
        def body(c, _):
            pos, img = c
            vel = u.at[:, 0].add(rate * pos[:, 1])
            p2 = pos + vel * dt
            x, y, z = p2[:, 0], p2[:, 1], p2[:, 2]
            x, y, z, ix, iy, iz = wrap_comp(
                x, y, z, img[:, 0], img[:, 1], img[:, 2]
            )
            return (jnp.stack([x, y, z], axis=-1),
                    jnp.stack([ix, iy, iz], axis=-1)), None
        c, _ = jax.lax.scan(body, (pos, img), None, length=args.iters)
        return c

    @jax.jit
    def run_3n(pos_t, img_t, u_t):
        def body(c, _):
            pos, img = c
            vel = u_t.at[0].add(rate * pos[1])
            p2 = pos + vel * dt
            x, y, z, ix, iy, iz = wrap_comp(
                p2[0], p2[1], p2[2], img[0], img[1], img[2]
            )
            return (jnp.stack([x, y, z]), jnp.stack([ix, iy, iz])), None
        c, _ = jax.lax.scan(body, (pos_t, img_t), None, length=args.iters)
        return c

    @jax.jit
    def run_comp(x, y, z, ix, iy, iz, ux, uy, uz):
        def body(c, _):
            x, y, z, ix, iy, iz = c
            vx = ux + rate * y
            x2, y2, z2 = x + vx * dt, y + uy * dt, z + uz * dt
            return wrap_comp(x2, y2, z2, ix, iy, iz), None
        c, _ = jax.lax.scan(
            body, (x, y, z, ix, iy, iz), None, length=args.iters
        )
        return c

    cases = [
        ("n3  ", run_n3, (jnp.asarray(pos), jnp.asarray(img),
                          jnp.asarray(u))),
        ("3n  ", run_3n, (jnp.asarray(pos.T.copy()),
                          jnp.asarray(img.T.copy()),
                          jnp.asarray(u.T.copy()))),
        ("comp", run_comp, tuple(jnp.asarray(a) for a in
                                 (pos[:, 0], pos[:, 1], pos[:, 2],
                                  img[:, 0], img[:, 1], img[:, 2],
                                  u[:, 0], u[:, 1], u[:, 2]))),
    ]

    staged = []
    for name, fn, arrs in cases:
        out = fn(*arrs)
        jax.block_until_ready(out)
        staged.append((name, fn, arrs))
        print(f"[{name}] compiled", flush=True)

    for _ in range(args.reps):
        for name, fn, arrs in staged:
            t0 = time.perf_counter()
            out = fn(*arrs)
            jax.block_until_ready(out)
            dt_it = (time.perf_counter() - t0) / args.iters
            print(f"[{name}] {dt_it*1e6:8.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
