"""Probe XLA-level relayouts for the DSE conv chain (the 6% MXU op).

Round-2's Pallas kernels tied XLA at best; the remaining idea is a
*model-level* relayout that XLA itself can exploit: pack G=4 images into
the channel dim (batch 16 -> 4, C 32 -> 128, the full lane width) and run
the 3x3 convs as either

  a) grouped convs (feature_group_count=4, weights tiled per group), or
  b) block-diagonal dense kernels kron(I_4, w) — 4x the MXU FLOPs but
     full-lane tiles, which can still win when bandwidth-bound.

Variants measured on the real chip, batch 16 @ 256x384 (serving shape):
  1. dse_xla baseline (bf16)
  2. packed + grouped convs
  3. packed + block-diag dense
  4. block-diag dense int8 (W8A8 dynamic-free, timing only)

Run: python tools/dse_relayout_probe.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from rgba_tpu.core.precision import BF16_POLICY  # noqa: E402
from rgba_tpu.ops.enhance import DSE, dse_xla  # noqa: E402
from rgba_tpu.utils.benchmark import device_time  # noqa: E402

B, H, W, G = 16, 256, 384, 4
F = 32


def make_params(key):
    mod = DSE(in_ch=3, policy=BF16_POLICY)
    v = mod.init(key, jnp.zeros((1, 64, 64, 3)))
    # explicit-params layout: pull the dict the same way DSE builds it
    p = v["params"]

    def cp(name):
        return {"kernel": p[name]["kernel"], "bias": p[name]["bias"]}

    return {
        "input_conv": cp("input_conv"),
        "enh1": {"conv1": {"kernel": p["enh1"]["conv1"]["kernel"],
                           "bias": p["enh1"]["conv1"]["bias"]},
                 "conv2": {"kernel": p["enh1"]["conv2"]["kernel"],
                           "bias": p["enh1"]["conv2"]["bias"]}},
        "enh2": {"conv1": {"kernel": p["enh2"]["conv1"]["kernel"],
                           "bias": p["enh2"]["conv1"]["bias"]},
                 "conv2": {"kernel": p["enh2"]["conv2"]["kernel"],
                           "bias": p["enh2"]["conv2"]["bias"]}},
        "enh3": {"conv1": {"kernel": p["enh3"]["conv1"]["kernel"],
                           "bias": p["enh3"]["conv1"]["bias"]},
                 "conv2": {"kernel": p["enh3"]["conv2"]["kernel"],
                           "bias": p["enh3"]["conv2"]["bias"]}},
        "output_conv": cp("output_conv"),
    }


def pack(x):
    """(B,H,W,C) -> (B/G,H,W,G*C), channel idx = g*C + c — the SAME
    group-major layout as the production path (ops/enhance.py:
    dse_packed_xla); blockdiag below is imported from there so the probe
    always measures the shipped layout."""
    b, h, w, c = x.shape
    y = x.reshape(b // G, G, h, w, c).transpose(0, 2, 3, 1, 4)
    return y.reshape(b // G, h, w, G * c)


def unpack(y, c):
    bg, h, w, gc = y.shape
    x = y.reshape(bg, h, w, G, c).transpose(0, 3, 1, 2, 4)
    return x.reshape(bg * G, h, w, c)


def conv_grouped(x, w, b, pad):
    """x (N,H,W,G*Cin); w (k,k,Cin,Cout) applied per group."""
    k, _, cin, cout = w.shape
    wt = jnp.tile(w, (1, 1, 1, G))  # (k,k,cin, G*cout): group g = out slice g
    # HWIO for grouped conv: O must be G*cout with group-major order
    y = jax.lax.conv_general_dilated(
        x, wt, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=G)
    return y + jnp.tile(b, (G,))


def blockdiag(w):
    """kron(I_G, w) — the production implementation."""
    from rgba_tpu.ops.enhance import _blockdiag
    return _blockdiag(w, G)


def conv_bd(x, wb, b, pad):
    y = jax.lax.conv_general_dilated(
        x, wb, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + jnp.tile(b, (G,))


def dse_packed(x, params, conv):
    """Same math as dse_xla but in packed layout."""
    xp = pack(x)
    identity = xp
    first = conv(xp, params["input_conv"], 0)
    y = first
    for kname in ("enh1", "enh2", "enh3"):
        z = conv(y, params[kname]["conv1"], 1)
        z = jax.nn.relu(z)
        z = conv(z, params[kname]["conv2"], 1)
        y = y + z
    y = y + first
    y = conv(y, params["output_conv"], 0)
    return unpack(y + identity, 3)


def main(which):
    print("devices:", jax.devices(), "variant:", which, flush=True)
    key = jax.random.PRNGKey(0)
    params = make_params(key)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    xs = [jax.random.normal(jax.random.fold_in(key, i), (B, H, W, 3),
                            jnp.bfloat16) for i in range(3)]

    # 1. baseline (also the correctness oracle for the others)
    base = jax.jit(lambda x, p: dse_xla(x, p, BF16_POLICY, False))
    ref = base(xs[0], p16)
    if which in ("base", "all"):
        t0 = device_time(base, [(x, p16) for x in xs], iters=20)
        print(f"baseline dse_xla bf16: {t0*1e3:7.2f} ms", flush=True)
    if which == "base":
        return

    # 2. grouped
    def g_conv(xx, cp, pad):
        return conv_grouped(xx, cp["kernel"].astype(jnp.bfloat16),
                            cp["bias"].astype(jnp.bfloat16), pad)

    if which in ("grouped", "all"):
        grouped = jax.jit(lambda x, p: dse_packed(x, p, g_conv))
        out = grouped(xs[0], p16)
        err = jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        t1 = device_time(grouped, [(x, p16) for x in xs], iters=20)
        print(f"packed grouped fgc=4:  {t1*1e3:7.2f} ms  (max|err|={err:.2e})",
              flush=True)
    if which == "grouped":
        return

    # 3. block-diag dense
    pbd = {
        "input_conv": {"kernel": blockdiag(p16["input_conv"]["kernel"]),
                       "bias": p16["input_conv"]["bias"]},
        "output_conv": {"kernel": blockdiag(p16["output_conv"]["kernel"]),
                        "bias": p16["output_conv"]["bias"]},
    }
    for kname in ("enh1", "enh2", "enh3"):
        pbd[kname] = {c: {"kernel": blockdiag(p16[kname][c]["kernel"]),
                          "bias": p16[kname][c]["bias"]}
                      for c in ("conv1", "conv2")}

    def bd_conv(xx, cp, pad):
        return conv_bd(xx, cp["kernel"], cp["bias"], pad)

    if which in ("bd", "all"):
        bd = jax.jit(lambda x, p: dse_packed(x, p, bd_conv))
        out = bd(xs[0], pbd)
        err = jnp.max(jnp.abs(out.astype(jnp.float32)
                              - ref.astype(jnp.float32)))
        t2 = device_time(bd, [(x, pbd) for x in xs], iters=20)
        print(f"packed block-diag:     {t2*1e3:7.2f} ms  (max|err|={err:.2e})",
              flush=True)
    if which == "bd":
        return

    # 4. int8 timing shape-proxy: block-diag conv chain with int8 operands
    def bd_conv_i8(xx, cp, pad):
        y = jax.lax.conv_general_dilated(
            xx, cp["kernel"], (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return jnp.clip(y >> 7, -127, 127).astype(jnp.int8)

    pbd_i8 = jax.tree.map(
        lambda a: jnp.clip(jnp.round(a * 64), -127, 127).astype(jnp.int8), pbd)

    def dse_i8(x, p):
        xp = pack(jnp.clip(jnp.round(x * 64), -127, 127).astype(jnp.int8))
        first = bd_conv_i8(xp, p["input_conv"], 0)
        y = first
        for kname in ("enh1", "enh2", "enh3"):
            z = bd_conv_i8(y, p[kname]["conv1"], 1)
            z = jnp.maximum(z, 0)
            z = bd_conv_i8(z, p[kname]["conv2"], 1)
            y = (y + z).astype(jnp.int8)
        y = bd_conv_i8((y + first).astype(jnp.int8), p["output_conv"], 0)
        return unpack(y, 3)

    i8 = jax.jit(dse_i8)
    t3 = device_time(i8, [(x, pbd_i8) for x in xs], iters=20)
    print(f"packed block-diag i8:  {t3*1e3:7.2f} ms  (timing proxy only)",
          flush=True)


def main_deconv():
    """Final synthesis deconv 192->3 (k5 s2, lhs-dilated) plain vs packed
    block-diag 768->12: MXU tilexK product is invariant, but XLA's C=3
    output lowering may not be — measure which wins."""
    print("devices:", jax.devices(), "variant: deconv", flush=True)
    key = jax.random.PRNGKey(2)
    n, co = 192, 3
    w = jax.random.normal(key, (5, 5, n, co), jnp.float32) * 0.05
    b = jax.random.normal(jax.random.fold_in(key, 1), (co,), jnp.float32)
    xs = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                            (B, H, W, n), jnp.bfloat16) for i in range(3)]

    def deconv(x, wk, bk):
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(wk, (0, 1)).astype(jnp.bfloat16), (1, 1),
            ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bk.astype(jnp.bfloat16)

    plain = jax.jit(lambda x: deconv(x, w, b))
    t0 = device_time(plain, [(x,) for x in xs], iters=20)
    print(f"plain deconv 192->3:    {t0*1e3:7.2f} ms", flush=True)

    wbd = blockdiag(w)          # (5,5,768,12)
    bbd = jnp.tile(b, (G,))

    def packed_fn(x):
        xp = pack(x)
        return deconv(xp, wbd, bbd)

    packed = jax.jit(packed_fn)
    # parity: unpack and compare
    ref = plain(xs[0])
    got = unpack(packed(xs[0]), co)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    t1 = device_time(packed, [(x,) for x in xs], iters=20)
    print(f"packed deconv 768->12:  {t1*1e3:7.2f} ms  (max|err|={err:.2e})",
          flush=True)


def main_deconv_nchw():
    """Final deconv 192->3 in NCHW logical layout: output lanes become
    spatial W (full 128) instead of C=3 (3/128 useful).  XLA's layout
    assignment may already do this internally — measure, including the
    NHWC<->NCHW transposes a real model would pay at the boundaries."""
    print("devices:", jax.devices(), "variant: deconv_nchw", flush=True)
    key = jax.random.PRNGKey(4)
    n, co = 192, 3
    w = jax.random.normal(key, (5, 5, n, co), jnp.float32) * 0.05
    xs = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                            (B, H, W, n), jnp.bfloat16) for i in range(3)]
    wf = jnp.flip(w, (0, 1)).astype(jnp.bfloat16)

    def nhwc(x):
        return jax.lax.conv_general_dilated(
            x, wf, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def nchw(x):
        xc = x.transpose(0, 3, 1, 2)
        wc = wf.transpose(3, 2, 0, 1)        # OIHW
        y = jax.lax.conv_general_dilated(
            xc, wc, (1, 1), ((2, 3), (2, 3)), lhs_dilation=(2, 2),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return y.transpose(0, 2, 3, 1)

    f0, f1 = jax.jit(nhwc), jax.jit(nchw)
    ref, got = f0(xs[0]), f1(xs[0])
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    t0 = device_time(f0, [(x,) for x in xs], iters=20)
    t1 = device_time(f1, [(x,) for x in xs], iters=20)
    print(f"deconv 192->3 NHWC: {t0*1e3:7.2f} ms | NCHW(+transposes): "
          f"{t1*1e3:7.2f} ms  (max|err|={err:.2e})", flush=True)


def main_gate():
    """WinGate RU chain (conv1x1 192->96, conv3x3 96->96, conv1x1 96->192,
    x3 trunk + x3 gate + final 1x1) plain vs 4-image packed block-diag.
    The 96-ch intermediates pad 1.33x; packing costs 4x MACs at ~35% MXU —
    measure which effect dominates."""
    from rgba_tpu.core.precision import BF16_POLICY as pol
    print("devices:", jax.devices(), "variant: gate", flush=True)
    key = jax.random.PRNGKey(3)
    n, hh, ww = 192, 128, 192

    def ru_params(k, i):
        kk = jax.random.fold_in(k, i)
        mk = lambda s, j: jax.random.normal(  # noqa: E731
            jax.random.fold_in(kk, j), s, jnp.float32) * 0.05
        return {
            "conv0": {"kernel": mk((1, 1, n, n // 2), 0),
                      "bias": mk((n // 2,), 1)},
            "conv1": {"kernel": mk((3, 3, n // 2, n // 2), 2),
                      "bias": mk((n // 2,), 3)},
            "conv2": {"kernel": mk((1, 1, n // 2, n), 4),
                      "bias": mk((n,), 5)},
        }

    params = {f"t{i}": ru_params(key, i) for i in range(3)}
    params.update({f"g{i}": ru_params(key, 10 + i) for i in range(3)})
    params["final"] = {"kernel": jax.random.normal(
        jax.random.fold_in(key, 99), (1, 1, n, n), jnp.float32) * 0.05,
        "bias": jnp.zeros((n,), jnp.float32)}
    xs = [jax.random.normal(jax.random.fold_in(key, 50 + i),
                            (B, hh, ww, n), jnp.bfloat16) for i in range(3)]

    def conv(t, p, pad, bd=False):
        wk = p["kernel"].astype(jnp.bfloat16)
        bk = p["bias"].astype(jnp.bfloat16)
        if bd:
            wk, bk = blockdiag(wk), jnp.tile(bk, (G,))
        y = jax.lax.conv_general_dilated(
            t, wk, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bk

    def chain(t, names, bd):
        for nm in names:
            p = params[nm]
            y = jax.nn.gelu(conv(t, p["conv0"], 0, bd), approximate=True)
            y = jax.nn.gelu(conv(y, p["conv1"], 1, bd), approximate=True)
            y = conv(y, p["conv2"], 0, bd)
            t = jax.nn.gelu(t + y, approximate=True)
        return t

    def gatechain(x, bd):
        trunk = chain(x, ["t0", "t1", "t2"], bd)
        gate = chain(x, ["g0", "g1", "g2"], bd)
        fin = conv(gate, params["final"], 0, bd)
        return x + trunk * jax.nn.sigmoid(fin)

    plain = jax.jit(lambda x: gatechain(x, False))
    t0 = device_time(plain, [(x,) for x in xs], iters=20)
    print(f"plain gate chain C=192: {t0*1e3:7.2f} ms", flush=True)

    packed = jax.jit(lambda x: unpack(gatechain(pack(x), True), n))
    ref, got = plain(xs[0]), packed(xs[0])
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
    t1 = device_time(packed, [(x,) for x in xs], iters=20)
    print(f"packed gate chain:      {t1*1e3:7.2f} ms  (max|err|={err:.2e})",
          flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["deconv"]:
        main_deconv()
    elif sys.argv[1:2] == ["deconv_nchw"]:
        main_deconv_nchw()
    elif sys.argv[1:2] == ["gate"]:
        main_gate()
    else:
        main(sys.argv[1] if len(sys.argv) > 1 else "all")
