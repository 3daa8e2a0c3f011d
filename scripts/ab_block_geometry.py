"""A/B the Pallas attention q-block geometry: ceil-based row-spreading
(current _block_geometry) vs floor-based fewer-bigger-blocks (ADVICE r2:
the docstring's examples described the floor behavior).

ceil:  n_blocks = ceil(lq/256), block_q = roundup(ceil(lq/n), 8)
       257 -> 2 x 136, 1582 -> 7 x 232
floor: n_blocks = max(1, lq//256), block_q = roundup(ceil(lq/n), 8)
       257 -> 1 x 264, 1582 -> 6 x 264

Usage: python scripts/ab_block_geometry.py [reps]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import rtvc_tpu  # noqa: F401
    from rtvc_tpu.ops import attention as A

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    print(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    orig = A._block_geometry

    def floor_geometry(lq, lkv, d, h, itemsize, block_q, max_block_h=None):
        n_blocks = max(1, lq // block_q)
        block_q = A._round_up(-(-lq // n_blocks), 8)
        per_head = (2.5 * block_q * lkv * 4
                    + (block_q + 2 * lkv) * d * itemsize)
        block_h = max(1, min(h, int(6e6 // per_head)))
        if max_block_h is not None:
            block_h = min(block_h, max_block_h)
        while h % block_h:
            block_h -= 1
        return block_q, block_h

    def scan_time(fn, q, k, v):
        def run(n):
            def body(carry, _):
                qq = q + carry.astype(q.dtype)
                o = fn(qq, k, v)
                s = jnp.sum(o.astype(jnp.float32))[None]
                return s * 1e-12, ()
            f = jax.jit(lambda q, k, v: jax.lax.scan(
                body, jnp.zeros((1,), jnp.float32), None, length=n)[0])
            np.asarray(f(q, k, v))
            t0 = time.perf_counter()
            for _ in range(3):
                np.asarray(f(q, k, v))
            return (time.perf_counter() - t0) / 3
        return max(run(1 + reps) - run(1), 1e-9) / reps * 1e3

    shapes = [
        ("clip 48x16x257x64", (48, 16, 257, 64), False, 0),
        ("joint 8x12x1582x64 pc1542", (8, 12, 1582, 64), True, 1542),
    ]
    for name, qs, causal, plen in shapes:
        q = jnp.asarray(rng.normal(size=qs), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=qs), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=qs), jnp.bfloat16)
        fn = lambda q, k, v: A.flash_attention(  # noqa: E731
            q, k, v, causal=causal, prefix_len=plen)
        lq = qs[2]
        for tag, geom in (("ceil ", orig), ("floor", floor_geometry)):
            A._block_geometry = geom
            bq, bh = geom(lq, lq, qs[3], qs[1], 2, 256)
            try:
                ref = np.asarray(fn(q, k, v), np.float32)
                ms = scan_time(fn, q, k, v)
                print(f"{name:28s} {tag} block_q={bq:4d} block_h={bh} "
                      f"n={-(-lq // bq)}  {ms:7.3f} ms")
            except Exception as e:
                print(f"{name:28s} {tag} FAILED {type(e).__name__}: {e}")
            finally:
                A._block_geometry = orig


if __name__ == "__main__":
    main()
