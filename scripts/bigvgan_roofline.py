"""BigVGAN roofline accounting (VERDICT r03 #8).

Gives the 787 audio-s/s BigVGAN floor the same per-mechanism roofline
treatment the HiFiGAN headline got: traces every conv in one forward pass
(batch 8 x 960 mel frames, the bench geometry), splits FLOPs and bytes
between the alias-free-act phase convs and the conv/upsample skeleton,
and divides by the round-3 measured wall times (95 ms acts, 62 ms
skeleton; BENCH_NOTES round-3 table) to state achieved TFLOP/s and GB/s
against the chip's measured sustained rates (160-166 TFLOP/s bf16 MXU,
~110-180 GB/s practical elementwise stream rate; HBM pin rate ~819 GB/s
on v5e).

Run on CPU — it only *traces* shapes (jax.eval_shape), no execution.
"""

import math
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from toucan_tpu.models.vocoders import BigVGAN

RECORDS = []


def install_conv_probe():
    orig = jax.lax.conv_general_dilated

    def probe(lhs, rhs, window_strides, padding, *args, **kwargs):
        import traceback

        site = "other"
        for frame in traceback.extract_stack():
            if "alias_free" in frame.filename:
                site = "act"
                break
        out = orig(lhs, rhs, window_strides, padding, *args, **kwargs)
        RECORDS.append((site, tuple(lhs.shape), tuple(rhs.shape),
                        tuple(out.shape), tuple(window_strides)))
        return out

    jax.lax.conv_general_dilated = probe
    return orig


def conv_flops(lhs, rhs, out):
    """MACs*2 for a conv: out_elems * (k * c_in) * 2 (dense accounting —
    what the MXU actually executes for the dense-diagonal phase kernels)."""
    out_elems = math.prod(out)
    if len(rhs) == 3:  # (k, cin, cout) flax OIW variants
        k, cin = rhs[0], rhs[1]
    else:
        k, cin = rhs[-1], rhs[1]
    return 2 * out_elems * k * cin


def main():
    b, frames = 8, 960
    audio_seconds = b * frames * 256 / 16000.0
    model = BigVGAN(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    mel = jnp.zeros((b, frames, 80), jnp.bfloat16)
    variables = jax.eval_shape(model.init, rng, mel)
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)

    orig = install_conv_probe()
    try:
        # trace once without executing: eval_shape walks the whole graph
        jax.eval_shape(lambda v, m: model.apply(v, m), variables, mel)
    finally:
        jax.lax.conv_general_dilated = orig

    tot = {"act": [0, 0], "other": [0, 0]}  # flops, bytes
    for site, lhs, rhs, out, _ in RECORDS:
        f = conv_flops(lhs, rhs, out)
        by = 2 * (math.prod(lhs) + math.prod(out)) + 2 * math.prod(rhs)
        tot[site][0] += f
        tot[site][1] += by

    act_f, act_b = tot["act"]
    sk_f, sk_b = tot["other"]
    print(f"traced {len(RECORDS)} convs on (8, 960, 80) bf16 "
          f"({audio_seconds:.1f} audio-s per call)")
    print(f"act  phase convs: {act_f/1e12:.3f} TFLOP  {act_b/1e9:.2f} GB moved")
    print(f"skeleton  convs : {sk_f/1e12:.3f} TFLOP  {sk_b/1e9:.2f} GB moved")

    # measured round-3 wall split (BENCH_NOTES): 156.1 ms total =
    # ~94 ms acts (156.1 - 61.8 acts-off) + 61.8 ms skeleton
    act_ms, sk_ms = 94.3, 61.8
    print(f"\nachieved rates at the round-3 measured split "
          f"({act_ms} ms acts / {sk_ms} ms skeleton):")
    print(f"  acts    : {act_f/act_ms/1e9:.1f} TFLOP/s "
          f"({act_f/act_ms/1e9/163*100:.0f}% of 163 sustained)  |  "
          f"{act_b/act_ms/1e6:.0f} GB/s")
    print(f"  skeleton: {sk_f/sk_ms/1e9:.1f} TFLOP/s "
          f"({sk_f/sk_ms/1e9/163*100:.0f}% of 163 sustained)  |  "
          f"{sk_b/sk_ms/1e6:.0f} GB/s")

    # per-stage act breakdown for the ceiling argument
    print("\nper-shape act convs (folded phase convs spend f*C dense lanes):")
    seen = {}
    for site, lhs, rhs, out, _ in RECORDS:
        if site != "act":
            continue
        key = (lhs[-1], rhs[0], rhs[1], rhs[-1] if len(rhs) > 2 else 0)
        f = conv_flops(lhs, rhs, out)
        c = seen.setdefault(key, [0, 0])
        c[0] += 1
        c[1] += f
    for (lanes, k, cin, cout), (n, f) in sorted(seen.items(),
                                                key=lambda kv: -kv[1][1]):
        print(f"  {n:3d}x lanes={lanes:4d} k={k:2d} {cin:4d}->{cout:4d}: "
              f"{f/1e12:.3f} TFLOP")


if __name__ == "__main__":
    main()
