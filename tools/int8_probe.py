"""Probe v5e int8 MXU throughput vs bf16 at model shapes.

Round-3 question (PERFORMANCE.md "next targets"): the conv pipelines sit
at XLA's 35-40% MXU ceiling in bf16; v5e advertises 2x peak int8
(394 TOPS vs 197 TFLOP/s bf16).  Before building a quantized serving
path, measure whether XLA actually lowers int8 dots/convs to the MXU
int8 path at OUR shapes:

  1. square matmuls 4096/8192 (peak check)
  2. the model's deconv shapes as implicit GEMMs (im2col dims)
  3. lax.conv_general_dilated int8 at the decoder shapes

Run on the real chip:  python tools/int8_probe.py
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from rgba_tpu.utils.benchmark import device_time  # noqa: E402


def bench_matmul(n, dtype, acc, iters=30):
    key = jax.random.PRNGKey(0)
    xs = []
    for i in range(3):
        a = jax.random.normal(jax.random.fold_in(key, i), (n, n)) * 3
        b = jax.random.normal(jax.random.fold_in(key, 100 + i), (n, n)) * 3
        if dtype == jnp.int8:
            a = jnp.clip(jnp.round(a * 10), -127, 127).astype(jnp.int8)
            b = jnp.clip(jnp.round(b * 10), -127, 127).astype(jnp.int8)
        else:
            a, b = a.astype(dtype), b.astype(dtype)
        xs.append((a, b))

    @jax.jit
    def f(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc)

    t = device_time(f, xs, iters=iters)
    tops = 2 * n**3 / t / 1e12
    return t, tops


def bench_conv(shape_in, cout, k, stride, dtype, acc, lhs_dil=1, iters=30):
    key = jax.random.PRNGKey(1)
    b, h, w, cin = shape_in
    xs = []
    for i in range(3):
        x = jax.random.normal(jax.random.fold_in(key, i), (b, h, w, cin))
        wk = jax.random.normal(jax.random.fold_in(key, 50 + i), (k, k, cin, cout))
        if dtype == jnp.int8:
            x = jnp.clip(jnp.round(x * 20), -127, 127).astype(jnp.int8)
            wk = jnp.clip(jnp.round(wk * 20), -127, 127).astype(jnp.int8)
        else:
            x, wk = x.astype(dtype), wk.astype(dtype)
        xs.append((x, wk))

    pad = k // 2
    if lhs_dil > 1:
        padding = ((k - 1 - pad, k - pad), (k - 1 - pad, k - pad))
        strides = (1, 1)
    else:
        padding = ((pad, pad), (pad, pad))
        strides = (stride, stride)

    @jax.jit
    def f(x, wk):
        return jax.lax.conv_general_dilated(
            x, wk, strides, padding,
            lhs_dilation=(lhs_dil, lhs_dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    t = device_time(f, xs, iters=iters)
    if lhs_dil > 1:
        ho, wo = h * lhs_dil, w * lhs_dil
    else:
        ho, wo = h // stride, w // stride
    flops = 2 * b * ho * wo * cout * cin * k * k
    return t, flops / t / 1e12


def main():
    print("devices:", jax.devices(), flush=True)

    for n in (4096, 8192):
        t_bf, tf_bf = bench_matmul(n, jnp.bfloat16, jnp.float32)
        t_i8, tf_i8 = bench_matmul(n, jnp.int8, jnp.int32)
        print(f"matmul {n}^3: bf16 {t_bf*1e3:7.2f} ms {tf_bf:6.1f} TF/s | "
              f"int8 {t_i8*1e3:7.2f} ms {tf_i8:6.1f} TOP/s | "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)

    # model shapes (batch 16 serving, 256x384 input):
    # g_s deconvs: (16,16,24,320)->... latents y:320ch at 16x24
    convs = [
        # label, in_shape, cout, k, s, lhs_dil
        ("g_a conv1 5x5s2 (128x192x96->96)", (16, 128, 192, 96), 96, 5, 2, 1),
        ("g_s deconv 5x5 dil2 (32x48x192)", (16, 32, 48, 192), 96, 5, 1, 2),
        ("g_s deconv 5x5 dil2 (64x96x96)", (16, 64, 96, 96), 96, 5, 1, 2),
        ("hyper/slice 3x3s1 (16x24x320)", (16, 16, 24, 320), 256, 3, 1, 1),
        ("RU 3x3s1 (16x24x192)", (16, 16, 24, 192), 96, 3, 1, 1),
    ]
    for label, si, co, k, s, dil in convs:
        t_bf, tf_bf = bench_conv(si, co, k, s, jnp.bfloat16, jnp.float32,
                                 lhs_dil=dil)
        t_i8, tf_i8 = bench_conv(si, co, k, s, jnp.int8, jnp.int32,
                                 lhs_dil=dil)
        print(f"{label}: bf16 {t_bf*1e3:7.2f} ms {tf_bf:5.1f} TF/s | "
              f"int8 {t_i8*1e3:7.2f} ms {tf_i8:5.1f} TOP/s | "
              f"speedup {t_bf/t_i8:.2f}x", flush=True)


if __name__ == "__main__":
    main()
