import jax
import jax.numpy as jnp
import numpy as np

from toucan_tpu.nn.attention import rel_shift
from toucan_tpu.nn.length_regulator import length_regulate, regulate_durations
from toucan_tpu.nn.masks import make_non_pad_mask, make_pad_mask
from toucan_tpu.nn.glow import squeeze, unsqueeze
from toucan_tpu.nn.positional import relative_position_encoding


def test_masks():
    m = make_non_pad_mask(jnp.array([2, 4]), 5)
    assert m.tolist() == [[True, True, False, False, False],
                          [True, True, True, True, False]]
    assert (make_pad_mask(jnp.array([2, 4]), 5) == ~m).all()


def test_rel_shift_matches_bruteforce():
    b, h, t = 2, 3, 7
    x = np.random.randn(b, h, t, 2 * t - 1).astype(np.float32)
    out = np.asarray(rel_shift(jnp.asarray(x)))
    # out[i, j] should be x[i, T-1-i+j] (offset table indexed by i-j)
    expect = np.zeros((b, h, t, t), np.float32)
    for i in range(t):
        for j in range(t):
            expect[:, :, i, j] = x[:, :, i, t - 1 - i + j]
    np.testing.assert_allclose(out, expect)


def test_length_regulate_matches_repeat_interleave():
    b, t, d = 3, 5, 4
    rng = np.random.RandomState(0)
    xs = rng.randn(b, t, d).astype(np.float32)
    ds = rng.randint(0, 4, size=(b, t))
    max_frames = int(ds.sum(1).max()) + 2
    out = np.asarray(length_regulate(jnp.asarray(xs), jnp.asarray(ds), max_frames))
    for i in range(b):
        ref = np.repeat(xs[i], ds[i], axis=0)
        np.testing.assert_allclose(out[i, :len(ref)], ref, rtol=1e-6)
        assert np.all(out[i, len(ref):] == 0.0)


def test_regulate_durations_zero_row_fallback():
    ds = jnp.array([[0, 0, 0], [1, 2, 0]])
    out = regulate_durations(ds)
    assert out.tolist() == [[1, 1, 1], [1, 2, 0]]


def test_squeeze_unsqueeze_roundtrip():
    x = jnp.asarray(np.random.randn(2, 8, 6).astype(np.float32))
    sq, m = squeeze(x)
    assert sq.shape == (2, 4, 12)
    back, _ = unsqueeze(sq, m)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-6)


def test_squeeze_channel_order_matches_reference_layout():
    # reference squeezes (B, C, T): new channel s*C + c takes x[c, 2k+s]
    b, t, c = 1, 6, 4
    x = np.arange(b * t * c, dtype=np.float32).reshape(b, t, c)
    sq, _ = squeeze(jnp.asarray(x))
    ref = x.transpose(0, 2, 1)  # (B, C, T)
    tt = (t // 2) * 2
    ref_sq = ref[:, :, :tt].reshape(b, c, tt // 2, 2).transpose(0, 3, 1, 2).reshape(b, 2 * c, tt // 2)
    np.testing.assert_allclose(np.asarray(sq).transpose(0, 2, 1), ref_sq)


def test_relative_position_encoding_against_reference_formula():
    import math
    t, d = 5, 8
    pe = np.asarray(relative_position_encoding(t, d))[0]
    assert pe.shape == (2 * t - 1, d)
    div = np.exp(np.arange(0, d, 2) * -(math.log(10000.0) / d))
    # row 0 is offset t-1 (positive side), last row is offset -(t-1)
    np.testing.assert_allclose(pe[0, 0::2], np.sin((t - 1) * div), rtol=1e-5)
    np.testing.assert_allclose(pe[-1, 0::2], np.sin(-(t - 1) * div), rtol=1e-5)
    np.testing.assert_allclose(pe[t - 1], np.concatenate([np.zeros(1), np.ones(1)]).repeat(d // 2).reshape(2, -1).T.ravel(), atol=1e-6)


def test_normed_conv_matches_torch_weight_and_spectral_norm():
    """NormedConv reproduces torch.nn.utils.weight_norm (dim=0) and
    spectral_norm (converged power iteration) on a 1-D conv."""
    import torch
    import numpy as np
    import jax, jax.numpy as jnp
    from toucan_tpu.nn.param_norm import NormedConv

    torch.manual_seed(0)
    c_in, c_out, k, t = 6, 10, 5, 32
    tconv = torch.nn.Conv1d(c_in, c_out, k, padding=k // 2)
    x = np.random.RandomState(0).randn(2, t, c_in).astype(np.float32)

    # ---- weight norm: identical decomposition -> identical forward
    wn = torch.nn.utils.weight_norm(torch.nn.Conv1d(c_in, c_out, k, padding=k // 2))
    with torch.no_grad():
        expect = wn(torch.tensor(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    v = wn.weight_v.detach().numpy().transpose(2, 1, 0)  # (k, in, out)
    g = wn.weight_g.detach().numpy().reshape(-1)
    bias = wn.bias.detach().numpy()
    model = NormedConv(c_out, (k,), norm="weight")
    got = model.apply({"params": {"v": jnp.asarray(v), "g": jnp.asarray(g),
                                  "bias": jnp.asarray(bias)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, atol=2e-5)

    # ---- spectral norm: sigma estimates agree after power iteration
    sn = torch.nn.utils.spectral_norm(
        torch.nn.Conv1d(c_in, c_out, k, padding=k // 2), n_power_iterations=50)
    with torch.no_grad():
        for _ in range(5):  # run forwards so torch's u converges
            sn(torch.tensor(x.transpose(0, 2, 1)))
        expect = sn(torch.tensor(x.transpose(0, 2, 1))).numpy().transpose(0, 2, 1)
    kern = sn.weight_orig.detach().numpy().transpose(2, 1, 0)
    bias = sn.bias.detach().numpy()
    model = NormedConv(c_out, (k,), norm="spectral")
    got = model.apply({"params": {"kernel": jnp.asarray(kern),
                                  "bias": jnp.asarray(bias)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), expect, rtol=2e-3, atol=2e-4)


def test_conditional_layer_norm_padded_rows_finite():
    """Batched inference regression: rows whose whole conv receptive field is
    padding have var == 0 under zero-init biases; the CLN must not emit NaNs
    there (they would spread into valid rows through later conv taps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from toucan_tpu.models.toucan_tts import ToucanTTS, ToucanTTSConfig

    cfg = ToucanTTSConfig()  # full-size: 7 pitch conv layers, k=5
    model = ToucanTTS(cfg)
    rng = jax.random.PRNGKey(0)
    b, tmax, frames = 2, 32, 64
    text = (jax.random.uniform(rng, (b, tmax, 62)) > 0.5).astype(jnp.float32)
    tl = jnp.asarray([tmax, tmax - 12], jnp.int32)  # 12 fully-padded rows
    utt = jax.random.normal(rng, (b, 64))
    lang = jnp.zeros((b, 1), jnp.int32)
    noise = jax.random.normal(rng, (b, frames, 80)) * 0.8
    variables = model.init(rng, text, tl, frames, utterance_embedding=utt,
                           lang_ids=lang, glow_noise=noise, method=ToucanTTS.infer)
    outs = model.apply(variables, text, tl, frames, utterance_embedding=utt,
                       lang_ids=lang, glow_noise=noise, method=ToucanTTS.infer)
    before, after, durations, pitch, energy, lens = outs
    for i in range(b):
        n = int(tl[i])
        assert np.isfinite(np.asarray(pitch)[i, :n]).all()
        assert np.isfinite(np.asarray(durations)[i, :n]).all()
        m = int(lens[i])
        assert np.isfinite(np.asarray(after)[i, :m]).all()
