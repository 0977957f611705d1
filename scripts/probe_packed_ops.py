"""Mosaic op probes for the group-packed soft kernel design.

Each probe is a minimal pallas_call exercising ONE op the packed kernels
need, compiled and checked on the real TPU (falls back to interpret mode
off-TPU, which hides Mosaic restrictions — run this THROUGH the tunnel).

Probes:
  P1  NT dot_general: contract lane axes of both operands
      (8, 128) x (256, 128) -> (8, 256)      [fwd segmentation]
  P2  TN dot_general: contract sublane axes of both operands
      (8, 128) x (8, 256) -> (128, 256)      [bwd cotangent select]
  P3  NN small-K dot: (256, 8) x (8, 128)    [bwd select, alt layout]
  P4  f32 -> bf16 -> f32 round-split inside the kernel (hi + exact lo)
  P5  broadcast compare: sublane iota (8,1) vs lane row (1,128) -> one-hot
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, kernel, out_shape, *args):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(*out_shape),
            interpret=jax.default_backend() != "tpu",
        )(*args)
        out = np.asarray(jax.block_until_ready(out))
        print(f"{name}: OK   out[0,:3]={out.reshape(out.shape[0], -1)[0, :3]}")
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8, 128), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (256, 128), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(2), (8, 256), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(3), (256, 8), jnp.float32)

    def p1(a_ref, b_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], b_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = _run("P1 NT dot (lanes x lanes)", p1, ((8, 256), jnp.float32), a, b)
    if out is not None:
        want = np.asarray(a) @ np.asarray(b).T
        print("    max|err| =", np.abs(out - want).max())

    def p2(a_ref, c_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            a_ref[...], c_ref[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = _run("P2 TN dot (sublanes x sublanes)", p2,
               ((128, 256), jnp.float32), a, c)
    if out is not None:
        want = np.asarray(a).T @ np.asarray(c)
        print("    max|err| =", np.abs(out - want).max())

    def p3(d_ref, a_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            d_ref[...], a_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = _run("P3 NN dot K=8", p3, ((256, 128), jnp.float32), d, a)
    if out is not None:
        want = np.asarray(d) @ np.asarray(a)
        print("    max|err| =", np.abs(out - want).max())

    def p4(b_ref, hi_ref, lo_ref):
        x = b_ref[...]
        hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        hi_ref[...] = hi
        lo_ref[...] = x - hi

    try:
        hi, lo = pl.pallas_call(
            p4,
            out_shape=(jax.ShapeDtypeStruct((256, 128), jnp.float32),
                       jax.ShapeDtypeStruct((256, 128), jnp.float32)),
            interpret=jax.default_backend() != "tpu",
        )(b)
        hi, lo = np.asarray(hi), np.asarray(lo)
        print("P4 round-split: OK   max|x-(hi+lo)| =",
              np.abs(np.asarray(b) - (hi + lo)).max())
    except Exception as e:  # noqa: BLE001
        print(f"P4 round-split: FAIL {type(e).__name__}: {str(e)[:200]}")

    def p5(b_ref, o_ref):
        ev = b_ref[0:1, :]  # (1, 128) lane row
        j = jax.lax.broadcasted_iota(jnp.float32, (8, 1), 0)
        o_ref[...] = (ev == j).astype(jnp.float32)

    _run("P5 iota-vs-row compare (8,128)", p5, ((8, 128), jnp.float32), b)

    # P6: the composed fwd pattern — NT dot with bf16 inputs, f32 acc
    def p6(a_ref, b_ref, o_ref):
        oh = a_ref[...].astype(jnp.bfloat16)
        x = b_ref[...]
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        y = jax.lax.dot_general(oh, hi, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        y += jax.lax.dot_general(oh, lo, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[...] = y

    out = _run("P6 NT bf16 split dot", p6, ((8, 256), jnp.float32), a, b)
    if out is not None:
        want = np.asarray(a) @ np.asarray(b).T
        print("    max rel err =",
              (np.abs(out - want) / (np.abs(want) + 1e-6)).max())


if __name__ == "__main__":
    main()
