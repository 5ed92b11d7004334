"""Round-3 perf campaign: roofline reconciliation + bf16 stage-kernel
variants for the vocoder (VERDICT r02 #1).

Subcommands:
  roofline   sustained dot_general rates (bf16 + int8) across shapes,
             resident on device, data-dependently chained — the numbers the
             vocoder ceiling argument must be built on.
  convrate   conv_general_dilated effective rates at the exact folded stage
             geometries (executed-FLOP accounting, not reference FLOPs).
  stages     per-stage standalone: XLA folded bf16 vs pallas stage kernel
             (mode="bf16", selective taps) at several tiles.
  inmodel    full-generator timings for kernel-selection variants.
  winograd   F(4,3) probe for the k=3 convs (fold=1 stages).

Each subcommand prints a JSON line; results feed BENCH_NOTES.md.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, chain=20, reps=3):
    """Best-of-``reps`` seconds per call of ``chain`` data-dependently
    linked calls measured through a host fetch."""

    @jax.jit
    def run(*a):
        def body(i, carry):
            out = fn(carry, *a[1:])
            eps = (1e-12 * jnp.real(jnp.mean(out))).astype(carry.dtype)
            return carry + eps

        return jnp.sum(jax.lax.fori_loop(0, chain, body, a[0])
                       .astype(jnp.float32))

    jax.device_get(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.device_get(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / chain


# ---------------------------------------------------------------------------
# roofline
# ---------------------------------------------------------------------------

def cmd_roofline(args):
    out = {"device": str(jax.devices()[0])}
    rng = jax.random.PRNGKey(0)

    def dot_rate(m, k, n, dtype, acc=None, chain=30):
        a = (jax.random.normal(rng, (m, k)) * 0.1).astype(dtype)
        b = (jax.random.normal(rng, (k, n)) * 0.1).astype(dtype)

        def f(x, w):
            return jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                       preferred_element_type=acc)

        sec = timed(f, a, b, chain=chain)
        return 2.0 * m * k * n / sec / 1e12

    table = {}
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192),
                    (2048, 2048, 2048), (16384, 8192, 8192),
                    (65536, 512, 512), (65536, 128, 128),
                    (262144, 128, 128), (737280, 128, 128),
                    (737280, 384, 128), (737280, 128, 384),
                    (737280, 1152, 128)]:
        key = f"bf16_{m}x{k}x{n}"
        table[key] = round(dot_rate(m, k, n, jnp.bfloat16), 1)
        print(key, table[key], flush=True)
    for m, k, n in [(4096, 4096, 4096), (8192, 8192, 8192),
                    (737280, 128, 128), (737280, 384, 128)]:
        key = f"int8_{m}x{k}x{n}"
        table[key] = round(dot_rate(m, k, n, jnp.int8, acc=jnp.int32), 1)
        print(key, table[key], flush=True)
    # f32-accumulate bf16 (what convs do internally)
    table["bf16accf32_4096"] = round(
        dot_rate(4096, 4096, 4096, jnp.bfloat16, acc=jnp.float32), 1)
    out["tflops"] = table
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# conv effective rates at stage geometry
# ---------------------------------------------------------------------------

STAGES = [  # (channels, fold, frames@960-mel-bench): rows = B*T/fold
    (256, 1, 7680), (128, 1, 46080), (64, 2, 184320), (32, 4, 368640)]


def cmd_convrate(args):
    from toucan_tpu.kernels.folded_conv import fold_conv_kernel, folded_conv_padding

    rng = jax.random.PRNGKey(0)
    out = {}
    b = 8
    for (c, f, t) in STAGES:
        lanes = c * f
        rows = t // f
        x = (jax.random.normal(rng, (b, rows, lanes)) * 0.1).astype(jnp.bfloat16)
        for k, d in [(3, 1), (3, 5), (7, 1), (7, 5), (11, 1), (11, 5)]:
            w = (jax.random.normal(rng, (k, c, c)) * 0.05).astype(jnp.float32)
            wp = fold_conv_kernel(w, f, d).astype(jnp.bfloat16)
            lo, hi = folded_conv_padding(k, f, d)

            def conv(xx, ww):
                return jax.lax.conv_general_dilated(
                    xx, ww, window_strides=(1,), padding=[(lo, hi)],
                    dimension_numbers=("NHC", "HIO", "NHC"))

            sec = timed(conv, x, wp, chain=20)
            kp = wp.shape[0]
            executed = 2.0 * b * rows * kp * lanes * lanes
            reference = 2.0 * b * t * k * c * c
            key = f"C{c}_f{f}_k{k}_d{d}"
            out[key] = {
                "ms": round(sec * 1e3, 3),
                "exec_tflops": round(executed / sec / 1e12, 1),
                "ref_tflops": round(reference / sec / 1e12, 1),
                "kp": kp,
                "overhead": round(executed / reference, 2),
            }
            print(key, out[key], flush=True)
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# per-stage standalone: XLA folded vs pallas bf16
# ---------------------------------------------------------------------------

def _stack_params(rng, c, kernel_sizes=(3, 7, 11), n_dil=3):
    params = []
    for k in kernel_sizes:
        rounds = []
        for _ in range(n_dil):
            k1 = jax.random.normal(rng, (k, c, c)) * 0.05
            b1 = jax.random.normal(rng, (c,)) * 0.01
            k2 = jax.random.normal(rng, (k, c, c)) * 0.05
            b2 = jax.random.normal(rng, (c,)) * 0.01
            params.append(None)
            rounds.append((k1, b1, k2, b2))
        params[-n_dil:] = []
        params.append(rounds)
    return params


def _xla_stage(x_folded, params, fold, kernel_sizes=(3, 7, 11),
               dilations=(1, 3, 5), slope=0.1):
    """The production XLA path: plain dilated convs at fold=1 (what the
    model's ResidualStack runs), block-Toeplitz folded convs at fold>1."""
    from toucan_tpu.kernels.folded_conv import folded_conv

    def lrelu(v):
        return jnp.where(v >= 0, v, slope * v)

    def conv(x, w, b, d):
        if fold == 1:
            pad = (w.shape[0] - 1) // 2 * d
            return jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), (1,), [(pad, pad)], rhs_dilation=(d,),
                dimension_numbers=("NHC", "HIO", "NHC")) + b.astype(x.dtype)
        return folded_conv(x, w.astype(x.dtype), b.astype(x.dtype), fold, d)

    acc = 0.0
    for si, k in enumerate(kernel_sizes):
        xb = x_folded
        for di, d in enumerate(dilations):
            w1, b1, w2, b2 = params[si][di]
            h = conv(lrelu(xb), w1, b1, d)
            xb = xb + conv(lrelu(h), w2, b2, 1)
        acc = acc + xb
    return acc / len(kernel_sizes)


def cmd_stages(args):
    from toucan_tpu.kernels.pallas_stage import fused_stage_resstacks

    rng = jax.random.PRNGKey(0)
    b = 8
    out = {}
    for idx, (c, f, t) in enumerate(STAGES):
        lanes = c * f
        rows = t // f
        x = (jax.random.normal(rng, (b, rows, lanes)) * 0.1).astype(jnp.bfloat16)
        params = _stack_params(rng, c)
        row = {}

        sec = timed(lambda xx: _xla_stage(xx, params, f), x, chain=10)
        row["xla_bf16_ms"] = round(sec * 1e3, 2)

        for tile in (512, 1024):
            for pack in ("tap", "scratch", "concat"):
                try:
                    fn = functools.partial(
                        fused_stage_resstacks, stack_params=params, fold=f,
                        mode="bf16", stream_dtype=jnp.bfloat16, tile=tile,
                        tap_pack=pack)
                    sec = timed(lambda xx: fn(xx), x, chain=10)
                    row[f"pallas_bf16_{pack}_t{tile}_ms"] = round(sec * 1e3, 2)
                except Exception as exc:
                    row[f"pallas_bf16_{pack}_t{tile}_ms"] = f"ERR {str(exc)[:80]}"
        out[f"stage{idx}_C{c}_f{f}"] = row
        print(f"stage{idx}", row, flush=True)
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# in-model variants
# ---------------------------------------------------------------------------

def cmd_inmodel(args):
    from toucan_tpu.models.vocoders import HiFiGANGenerator

    rng = jax.random.PRNGKey(0)
    batch = int(os.environ.get("INMODEL_BATCH", "8"))
    frames = 960
    audio_seconds = batch * frames * 256 / 16000.0
    mel = jax.random.normal(rng, (batch, frames, 80), jnp.bfloat16)
    out = {}

    def measure(name, model, **kw):
        variables = jax.jit(model.init)(rng, mel)
        sec = timed(lambda m: model.apply(variables, m, **kw), mel, chain=20)
        out[name] = {"ms": round(sec * 1e3, 1),
                     "audio_s_per_s": round(audio_seconds / sec, 1)}
        print(name, out[name], flush=True)

    measure("default_xla_folded", HiFiGANGenerator(dtype=jnp.bfloat16))
    variants = os.environ.get("INMODEL_PALLAS", "")
    if variants:
        for stages in [(2,), (2, 3)]:
            name = "pallas_bf16_s" + "".join(map(str, stages))
            try:
                measure(name, HiFiGANGenerator(dtype=jnp.bfloat16,
                                               stage_mode="bf16",
                                               stage_indices=stages,
                                               stage_tile=1024))
            except Exception as exc:
                out[name] = f"ERR {str(exc)[:100]}"
                print(name, out[name], flush=True)
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# Winograd F(4,3) probe
# ---------------------------------------------------------------------------

# F(4,3) transform matrices (standard, Lavin & Gray 2015 scaling).
_BT = np.array([
    [4,  0, -5,  0, 1, 0],
    [0, -4, -4,  1, 1, 0],
    [0,  4, -4, -1, 1, 0],
    [0, -2, -1,  2, 1, 0],
    [0,  2, -1, -2, 1, 0],
    [0,  4,  0, -5, 0, 1],
], dtype=np.float32)
_G = np.array([
    [1 / 4, 0, 0],
    [-1 / 6, -1 / 6, -1 / 6],
    [-1 / 6, 1 / 6, -1 / 6],
    [1 / 24, 1 / 12, 1 / 6],
    [1 / 24, -1 / 12, 1 / 6],
    [0, 0, 1],
], dtype=np.float32)
_AT = np.array([
    [1, 1, 1, 1, 1, 0],
    [0, 1, -1, 2, -2, 0],
    [0, 1, 1, 4, 4, 0],
    [0, 1, -1, 8, -8, 1],
], dtype=np.float32)


def winograd_conv_k3(x, w, b):
    """SAME k=3 d=1 conv via F(4,3): x (B, T, C) with T % 4 == 0,
    w (3, C_in, C_out).  FLOPs: 6 C^2 per 4 outputs vs 12 direct."""
    bsz, t, cin = x.shape
    cout = w.shape[-1]
    # frame into (n_tiles, 6) overlapping windows, stride 4, pad 1 each side
    xp = jnp.pad(x, ((0, 0), (1, 5), (0, 0)))  # left pad 1; right covers tail
    n = t // 4
    # 6 strided slices -> (B, n, 6, C); slice i takes rows 4j + i
    cols = [jax.lax.slice_in_dim(xp, i, i + (n - 1) * 4 + 1, 4, axis=1)
            for i in range(6)]
    tiles = jnp.stack(cols, axis=2)  # (B, n, 6, C)
    bt = jnp.asarray(_BT, x.dtype)
    v = jnp.einsum("ij,bnjc->bnic", bt, tiles)  # input transform (adds)
    u = jnp.einsum("ik,kcd->icd", jnp.asarray(_G, jnp.float32),
                   w.astype(jnp.float32)).astype(x.dtype)  # (6, Cin, Cout)
    m = jnp.einsum("bnic,icd->bnid", v, u)  # 6 batched matmuls — the MXU work
    at = jnp.asarray(_AT, x.dtype)
    y = jnp.einsum("oi,bnid->bnod", at, m)  # output transform (adds)
    return y.reshape(bsz, t, cout) + b.astype(x.dtype)


def cmd_winograd(args):
    rng = jax.random.PRNGKey(0)
    out = {}
    # numerics check (f32, CPU-safe)
    x = jax.random.normal(rng, (2, 64, 16), jnp.float32)
    w = jax.random.normal(rng, (3, 16, 16), jnp.float32) * 0.3
    bb = jax.random.normal(rng, (16,), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, w, (1,), [(1, 1)], dimension_numbers=("NHC", "HIO", "NHC")) + bb
    wino = winograd_conv_k3(x, w, bb)
    out["max_abs_err_f32"] = float(jnp.abs(direct - wino).max())
    print("err", out["max_abs_err_f32"], flush=True)

    b = 8
    for c, t in [(256, 7680), (128, 46080)]:
        x = (jax.random.normal(rng, (b, t, c)) * 0.1).astype(jnp.bfloat16)
        w = (jax.random.normal(rng, (3, c, c)) * 0.05).astype(jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def direct_fn(xx):
            return jax.lax.conv_general_dilated(
                xx, w.astype(xx.dtype), (1,), [(1, 1)],
                dimension_numbers=("NHC", "HIO", "NHC"))

        def wino_fn(xx):
            return winograd_conv_k3(xx, w, bias)

        sd = timed(direct_fn, x, chain=20)
        sw = timed(wino_fn, x, chain=20)
        out[f"C{c}"] = {"direct_ms": round(sd * 1e3, 3),
                        "wino_ms": round(sw * 1e3, 3),
                        "speedup": round(sd / sw, 2)}
        print(f"C{c}", out[f"C{c}"], flush=True)
    print(json.dumps(out))


# ---------------------------------------------------------------------------
# BigVGAN act-cost attribution (VERDICT r02 #5: re-profile post-poly-sin^2)
# ---------------------------------------------------------------------------

def cmd_bigvgan(args):
    import toucan_tpu.nn.alias_free as af
    import toucan_tpu.models.vocoders.bigvgan as bv
    from toucan_tpu.models.vocoders import BigVGAN

    only = set(os.environ.get("BV_VARIANTS", "").split(",")) - {""}

    def want(name):
        return not only or name in only

    rng = jax.random.PRNGKey(0)
    batch, frames = 8, 960
    audio_seconds = batch * frames * 256 / 16000.0
    mel = jax.random.normal(rng, (batch, frames, 80), jnp.bfloat16)
    model = BigVGAN(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(rng, mel)
    out = {}

    def measure(name):
        if not want(name):
            return
        sec = timed(lambda m: model.apply(variables, m), mel, chain=6)
        out[name] = {"ms": round(sec * 1e3, 1),
                     "audio_s_per_s": round(audio_seconds / sec, 1)}
        print(name, out[name], flush=True)

    orig_folded = bv.alias_free_snake_folded
    orig_plain = bv.alias_free_snake
    orig_snake = af.snake_beta
    orig_af_folded = af.alias_free_snake_folded  # not used by bigvgan directly

    measure("full_default")

    # (a) acts as pure identity: conv + upsample skeleton cost
    bv.alias_free_snake_folded = lambda x, a, b, f, **kw: x
    bv.alias_free_snake = lambda x, a, b, **kw: x
    measure("acts_identity")
    bv.alias_free_snake_folded = orig_folded
    bv.alias_free_snake = orig_plain

    # (b) snake -> identity inside the act (isolates the snake polynomial)
    af.snake_beta = lambda x, a, b, logscale=True, eps=1e-9: x
    measure("snake_identity")
    af.snake_beta = orig_snake

    # (c) folded acts without the exact edge patch (its stitch concats cost?)
    def folded_no_edge(x_folded, alpha, beta, f, logscale=True, **kw):
        from toucan_tpu.kernels.folded_conv import folded_conv
        c = x_folded.shape[-1] // f
        k0, k1, kde, kdo = (af._diag_kernel(t, c, x_folded.dtype)
                            for t in af._phase_filters())
        zero_b = jnp.zeros((c,), x_folded.dtype)
        alpha_f, beta_f = jnp.tile(alpha, f), jnp.tile(beta, f)
        even = af.snake_beta(folded_conv(x_folded, k0, zero_b, f, 1),
                             alpha_f, beta_f, logscale)
        odd = af.snake_beta(folded_conv(x_folded, k1, zero_b, f, 1),
                            alpha_f, beta_f, logscale)
        return (folded_conv(even, kde, zero_b, f, 1)
                + folded_conv(odd, kdo, zero_b, f, 1))

    bv.alias_free_snake_folded = folded_no_edge
    measure("no_edge_patch")

    # (d) batched-phase variant: ONE up conv to 2fC lanes, snake once,
    # ONE down conv back — halves conv passes, same FLOPs
    def folded_batched(x_folded, alpha, beta, f, logscale=True, **kw):
        from toucan_tpu.kernels.folded_conv import folded_conv
        fc = x_folded.shape[-1]
        c = fc // f
        k0, k1, kde, kdo = af._phase_filters()
        up = jnp.concatenate([af._diag_kernel(k0, c, x_folded.dtype),
                              af._diag_kernel(k1, c, x_folded.dtype)], axis=2)
        dn = jnp.concatenate([af._diag_kernel(kde, c, x_folded.dtype),
                              af._diag_kernel(kdo, c, x_folded.dtype)], axis=1)
        # up: (kp, C, 2C) diag pair -> fold as C_out = 2C
        zero2 = jnp.zeros((2 * c,), x_folded.dtype)
        zero1 = jnp.zeros((c,), x_folded.dtype)
        both = folded_conv(x_folded, up, zero2, f, 1)
        both = af.snake_beta(both, jnp.tile(jnp.concatenate([alpha, alpha]), f),
                             jnp.tile(jnp.concatenate([beta, beta]), f), logscale)
        return folded_conv(both, dn, zero1, f, 1)

    bv.alias_free_snake_folded = folded_batched
    try:
        measure("batched_phase_no_edge")
    except Exception as exc:
        out["batched_phase_no_edge"] = f"ERR {str(exc)[:120]}"
        print(out["batched_phase_no_edge"], flush=True)
    bv.alias_free_snake_folded = orig_folded

    print(json.dumps(out))


def main():
    try:
        import os
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["roofline", "convrate", "stages",
                                   "inmodel", "winograd", "bigvgan"])
    args = p.parse_args()
    globals()[f"cmd_{args.cmd}"](args)


if __name__ == "__main__":
    main()
