"""CTC forced aligner (mel -> phone posteriors) with MAS binarization.

Behavioral equivalent of the reference
(``TrainingInterfaces/Text_to_Spectrogram/AutoAligner/Aligner.py``):
5 BatchNorm conv layers (ReLU *before* the norm, as the reference does) ->
BiLSTM(512) -> linear over 145 phone classes (blank 144); inference takes
the logit columns of the target token sequence and binarizes with the
monotonic-alignment-search DP.

TPU-first notes: the LSTM input/gate projections are hoisted out of the
scan (one big MXU matmul per direction), packed-sequence semantics are
reproduced with masks, and MAS is provided both as a vectorized lax.scan
(on-device, for the utterance cloner) and as plain numpy (host-side dataset
building).
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from toucan_tpu.frontend.inventory import CTC_BLANK_ID, NUM_CTC_SYMBOLS


class BatchNormConv(nn.Module):
    channels: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.channels, (self.kernel_size,), use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, name="bn")(x)


class LSTMDirection(nn.Module):
    """One LSTM direction with torch gate order (i, f, g, o) and masking."""

    hidden: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, lengths=None):
        b, t, _ = xs.shape
        if lengths is None:
            lengths = jnp.full((b,), t, jnp.int32)
        if self.reverse:
            # flip each sequence within its true length
            idx = (lengths[:, None] - 1 - jnp.arange(t)[None, :]) % jnp.maximum(lengths, 1)[:, None]
            xs = jnp.take_along_axis(xs, idx[..., None], axis=1)

        gi_all = nn.Dense(4 * self.hidden, dtype=self.dtype, name="w_ih")(xs)
        w_hh = self.param("w_hh_kernel", nn.initializers.lecun_normal(),
                          (self.hidden, 4 * self.hidden), self.dtype)
        b_hh = self.param("w_hh_bias", nn.initializers.zeros,
                          (4 * self.hidden,), self.dtype)
        mask = (jnp.arange(t)[None, :] < lengths[:, None])  # (B, T)

        def step(carry, inp):
            h, c = carry
            gi, m = inp
            gates = gi + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
            h_new = nn.sigmoid(o) * jnp.tanh(c_new)
            m = m[:, None]
            h_new = jnp.where(m, h_new, h)
            c_new = jnp.where(m, c_new, c)
            return (h_new, c_new), jnp.where(m, h_new, 0.0)

        h0 = jnp.zeros((b, self.hidden), self.dtype)
        _, ys = jax.lax.scan(step, (h0, h0),
                             (gi_all.transpose(1, 0, 2), mask.T))
        ys = ys.transpose(1, 0, 2)
        if self.reverse:
            idx = (lengths[:, None] - 1 - jnp.arange(t)[None, :]) % jnp.maximum(lengths, 1)[:, None]
            ys = jnp.take_along_axis(ys, idx[..., None], axis=1)
            ys = jnp.where(mask[..., None], ys, 0.0)
        return ys


class Aligner(nn.Module):
    n_mels: int = 80
    num_symbols: int = NUM_CTC_SYMBOLS
    lstm_dim: int = 512
    conv_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, lengths=None, train: bool = False,
                 deterministic: bool = True):
        """mel (B, T, 80) -> logits (B, T, num_symbols)."""
        x = mel
        for i in range(5):
            x = BatchNormConv(self.conv_dim, 3, dtype=self.dtype,
                              name=f"conv_{i}")(x, train=train)
            x = nn.Dropout(0.5, deterministic=deterministic)(x)
        fwd = LSTMDirection(self.lstm_dim, dtype=self.dtype, name="lstm_fwd")(x, lengths)
        bwd = LSTMDirection(self.lstm_dim, reverse=True, dtype=self.dtype,
                            name="lstm_bwd")(x, lengths)
        x = jnp.concatenate([fwd, bwd], axis=-1)
        return nn.Dense(self.num_symbols, dtype=self.dtype, name="proj")(x)


def ctc_loss(logits, logit_lengths, labels, label_lengths,
             blank_id: int = CTC_BLANK_ID):
    """Mean CTC loss (matches torch.nn.CTCLoss(blank=144, zero_infinity)
    semantics of per-sequence-mean... torch default reduction='mean' divides
    each loss by its label length then averages)."""
    import optax

    t = logits.shape[1]
    s = labels.shape[1]
    logit_pad = (jnp.arange(t)[None, :] >= logit_lengths[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(s)[None, :] >= label_lengths[:, None]).astype(jnp.float32)
    labels = labels.astype(jnp.int32)  # tokens arrive float from some
    # cache paths; optax one-hots them and warns on float input
    per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad, blank_id=blank_id)
    per_seq = jnp.where(jnp.isinf(per_seq), 0.0, per_seq)  # zero_infinity
    return jnp.mean(per_seq / jnp.maximum(label_lengths, 1))


# ------------------------------------------------------------------- MAS

def mas_numpy(scores: np.ndarray) -> np.ndarray:
    """Monotonic alignment search over (frames, tokens) scores.

    Matches the reference ``binarize_alignment`` (Aligner.py:202-234)
    including its positive-shift preprocessing.
    """
    scores = np.asarray(scores, dtype=np.float64)
    scores = scores + (np.abs(scores).max() + 1.0)
    attn = np.log(scores)
    attn[0, 1:] = -np.inf
    frames, tokens = attn.shape
    log_p = np.full_like(attn, -np.inf)
    log_p[0] = attn[0]
    prev_ind = np.zeros_like(attn, dtype=np.int64)
    for i in range(1, frames):
        prev_same = log_p[i - 1]
        prev_move = np.concatenate([[-np.inf], log_p[i - 1, :-1]])
        take_move = prev_move >= prev_same
        log_p[i] = attn[i] + np.where(take_move, prev_move, prev_same)
        prev_ind[i] = np.where(take_move, np.arange(tokens) - 1, np.arange(tokens))
    opt = np.zeros((frames, tokens), dtype=np.float32)
    j = tokens - 1
    for i in range(frames - 1, -1, -1):
        opt[i, j] = 1.0
        j = prev_ind[i, j]
    opt[0, j] = 1.0
    return opt


def mas_jax(scores: jnp.ndarray) -> jnp.ndarray:
    """MAS as a lax.scan DP — same result as ``mas_numpy`` on device."""
    scores = scores.astype(jnp.float32)
    scores = scores + (jnp.abs(scores).max() + 1.0)
    attn = jnp.log(scores)
    frames, tokens = attn.shape
    neg_inf = jnp.float32(-1e30)
    first = jnp.where(jnp.arange(tokens) == 0, attn[0], neg_inf)

    def fwd(log_prev, attn_row):
        prev_move = jnp.concatenate([jnp.full((1,), neg_inf), log_prev[:-1]])
        take_move = prev_move >= log_prev
        log_new = attn_row + jnp.where(take_move, prev_move, log_prev)
        prev_j = jnp.where(take_move, jnp.arange(tokens) - 1, jnp.arange(tokens))
        return log_new, prev_j

    _, prev_inds = jax.lax.scan(fwd, first, attn[1:])
    prev_inds = jnp.concatenate([jnp.zeros((1, tokens), jnp.int32),
                                 prev_inds.astype(jnp.int32)])

    def bwd(j, prev_row):
        return prev_row[j], j

    _, path = jax.lax.scan(bwd, jnp.int32(tokens - 1), prev_inds, reverse=True)
    return jax.nn.one_hot(path, tokens, dtype=jnp.float32)


# -------------------------------------------------------------- dijkstra

def dijkstra_numpy(path_probs: np.ndarray) -> np.ndarray:
    """Shortest monotone path through the (frames, tokens) cost grid.

    Equivalent to the reference's alternative pathfinding
    (``Aligner.py:141-199,245-280``): a sparse graph over grid nodes with
    right / down / down-right moves, each edge weighted by the cost of the
    *target* cell, solved with scipy's Dijkstra from node (0, 0) to
    (frames-1, tokens-1); a frame visited multiple times (right moves) keeps
    the last token on the path.  The grid graph is a DAG in node order, so
    instead of materializing an O((T*N)^2) sparse matrix we run an exact
    per-row DP: vertical candidates come from row i-1, and the within-row
    right-move recurrence ``d[j] = min(v[j], d[j-1] + c[j])`` collapses to a
    running minimum of ``v - cumsum(c)`` (also correct for negative edge
    weights, where Dijkstra's greedy assumption breaks).

    Returns a (frames, tokens) binary path matrix with one 1 per frame.
    """
    costs = np.asarray(path_probs, dtype=np.float64)
    frames, cols = costs.shape
    dist = np.empty((frames, cols))
    # entry[i, j] = where (i, j) was entered from: own-row right move (the
    # column it descended from row i-1 at) vs vertical; sign marks diag.
    from_col = np.empty((frames, cols), dtype=np.int64)   # source column k<=j
    vert_diag = np.zeros((frames, cols), dtype=bool)      # True: (i-1,k-1)

    # row 0: only right moves from (0, 0); node (0, 0) itself costs nothing
    row_cum = np.cumsum(costs[0])
    dist[0] = row_cum - costs[0, 0]
    dist[0, 0] = 0.0
    from_col[0] = 0

    for i in range(1, frames):
        # vertical entry at column k: best of down (i-1, k) and diag (i-1, k-1)
        down = dist[i - 1] + costs[i]
        diag = np.concatenate([[np.inf], dist[i - 1, :-1]]) + costs[i]
        use_diag = diag < down
        vert = np.where(use_diag, diag, down)
        # within-row right moves: d[j] = min_{k<=j} vert[k] + (cum[j] - cum[k])
        cum = np.cumsum(costs[i])
        key = vert - cum
        run_min = np.minimum.accumulate(key)
        # argmin of the running minimum (first occurrence, ties -> smallest k)
        is_new_min = key == run_min
        k_star = np.maximum.accumulate(np.where(is_new_min, np.arange(cols), -1))
        dist[i] = run_min + cum
        from_col[i] = k_star
        vert_diag[i] = use_diag

    # backtrack from (frames-1, cols-1)
    path_plot = np.zeros((frames, cols), dtype=np.float32)
    i, j = frames - 1, cols - 1
    while True:
        k = from_col[i, j]
        path_plot[i, j] = 1.0  # last token per frame wins (mel_text overwrite)
        if i == 0:
            break
        # frame i was entered vertically at column k; frames only record the
        # final (largest) column, which is j — already set above
        j = k - 1 if vert_diag[i, k] else k
        i -= 1
    return path_plot


def alignment_from_logits(logits: np.ndarray, token_ids: np.ndarray,
                          method: str = "MAS") -> np.ndarray:
    """(T, num_symbols) logits + token id sequence -> (T, N) binary alignment
    on the token columns (reference: ``Aligner.inference`` with
    ``pathfinding="MAS"`` or ``"dijkstra"``)."""
    pred_max = np.asarray(logits)[:, np.asarray(token_ids)]
    if method.lower() == "dijkstra":
        return dijkstra_numpy(1.0 - pred_max)
    return mas_numpy(pred_max)
