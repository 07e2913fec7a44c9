"""Swin-Tiny backbone, NHWC, flax.linen — TPU-first rebuild of
/root/reference/modules/swin_transformer.py.

Architecture: 4x4 patch embed (dim 96) + 4 stages of shifted-window attention
blocks, depths (2,2,6,2), heads (3,6,12,24), window 7, MLP ratio 4,
stochastic depth 0.2, patch merging between stages, LayerNorm on the three
FPN-facing outputs (192/384/768 ch at strides 8/16/32).

TPU-first differences from the reference:
  * everything that is data-independent — window padding sizes, the shifted-
    window attention mask (reference BasicLayer:368-387), and the relative-
    position index (reference WindowAttention:153-164) — is precomputed
    host-side as static numpy and baked into the graph as constants;
  * tensors stay [B, H, W, C] NHWC end to end (no NCHW permutes);
  * window partition/reverse are pure reshape+transpose, and the per-window
    attention is one batched einsum chain XLA maps onto the MXU.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

WINDOW = 7
# Reference inits Linear weights with trunc_normal(std=.02), zero bias
# (swin_transformer.py:487-494).
_dense_init = nn.initializers.truncated_normal(0.02)


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int = WINDOW) -> np.ndarray:
    """[N, N] indices into the (2w-1)^2 bias table for every token pair."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing='ij'))          # [2, w, w]
    flat = coords.reshape(2, -1)                            # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]               # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window - 1
    rel[:, :, 1] += window - 1
    rel[:, :, 0] *= 2 * window - 1
    return rel.sum(-1).astype(np.int32)                     # [N, N]


@functools.lru_cache(maxsize=None)
def shifted_window_regions(hp: int, wp: int, window: int = WINDOW,
                           shift: int = WINDOW // 2) -> np.ndarray:
    """Static [nW, N] region ids of the shifted-window partition (reference
    BasicLayer:368-387 `img_mask`): token pairs in the same window with
    different ids must not attend to each other. hp/wp are padded sizes."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    # partition into windows
    img = img.reshape(hp // window, window, wp // window, window)
    return img.transpose(0, 2, 1, 3).reshape(-1, window * window)  # [nW, N]


@functools.lru_cache(maxsize=None)
def shifted_window_mask(hp: int, wp: int, window: int = WINDOW,
                        shift: int = WINDOW // 2) -> np.ndarray:
    """Static [nW, N, N] additive mask (0 / -100) hiding cross-region pairs
    in shifted windows."""
    img = shifted_window_regions(hp, wp, window, shift)
    diff = img[:, None, :] != img[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def pad_rowmask(h: int, w: int, hp: int, wp: int, shift: int,
                window: int = WINDOW):
    """Static [nW, N] 1/0 validity of each windowed row after padding
    (h, w) -> (hp, wp) and rolling by -shift: 0 marks a padding token. None
    when no padding is needed. Feeds the fused whole-block kernel, which
    zeroes the LN1 output on padding rows to reproduce the reference's
    pad-AFTER-norm semantics (swin_transformer.py:243-247)."""
    if hp == h and wp == w:
        return None
    m = np.zeros((hp, wp), np.float32)
    m[:h, :w] = 1.0
    if shift:
        m = np.roll(m, (-shift, -shift), axis=(0, 1))
    m = m.reshape(hp // window, window, wp // window, window)
    return m.transpose(0, 2, 1, 3).reshape(-1, window * window)


def window_partition(x: jnp.ndarray, window: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B * nW, window*window, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: jnp.ndarray, window: int, h: int, w: int) -> jnp.ndarray:
    """[B * nW, window*window, C] -> [B, H, W, C]."""
    c = x.shape[-1]
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowAttention(nn.Module):
    """Per-window MHA with relative position bias (reference
    WindowAttention:131-200). `region` is the [nW, N] int32 region-id map of
    the shifted partition (None for unshifted blocks). With `fused` the
    qkv-slice -> scores -> bias/mask -> softmax -> value product runs as one
    Pallas kernel in VMEM (ops/window_attention.py); otherwise it is the
    batched-einsum XLA formulation."""
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    fused: bool = False        # Pallas attention kernel (qkv slicing inside)
    fused_block: bool = False  # whole half-block kernel (qkv+attn+proj)

    @nn.compact
    def __call__(self, x, region: Optional[jnp.ndarray]):
        bnw, n, c = x.shape
        heads, hd = self.num_heads, self.dim // self.num_heads

        table = self.param(
            'rel_bias_table', nn.initializers.truncated_normal(0.02),
            ((2 * WINDOW - 1) ** 2, heads), jnp.float32)
        idx = jnp.asarray(relative_position_index())
        bias = table[idx.reshape(-1)].reshape(n, n, heads)
        bias = bias.transpose(2, 0, 1).astype(self.dtype)    # [heads, N, N]

        if self.fused_block:
            # Whole attention half: qkv projection + attention + output
            # projection as ONE Pallas pass (ops/window_attention.py
            # window_attention_block_fused) — the 3C-wide qkv tensor and the
            # attention output never round-trip HBM. _DenseParams twins keep
            # the param tree identical to the nn.Dense modules below.
            # Measured at 544/b16 (probes/_attn_block_probe.py): wins at
            # stages 0-1 (5.07 vs 5.46, 2.53 vs 2.96 ms), loses at stage 2+
            # (1.78 vs 1.56) — SwinTiny picks per stage.
            from yolact_minimal_tpu.ops.window_attention import \
                window_attention_block_fused
            wqkv, bqkv = _DenseParams(c, 3 * self.dim, name='qkv')()
            wproj, bproj = _DenseParams(self.dim, self.dim, name='proj')()
            reg = None if region is None else jnp.asarray(
                np.asarray(region, np.int32))
            return window_attention_block_fused(
                x.astype(self.dtype), wqkv, bqkv, bias, reg, wproj, bproj,
                heads)

        # Slice q/k/v out of the packed projection and let dot_general absorb
        # the head split — same channel->(head, hd) mapping as the reference
        # packing (swin_transformer.py:170-172) but with no explicit 5-D
        # transpose materializing a relayout of the full qkv tensor.
        qkv = nn.Dense(3 * self.dim, kernel_init=_dense_init, dtype=self.dtype, name='qkv')(x)

        if self.fused:
            from yolact_minimal_tpu.ops.window_attention import \
                window_attention_fused
            reg = None if region is None else jnp.asarray(
                np.asarray(region, np.int32))
            out = window_attention_fused(qkv, bias, reg, heads)
            return nn.Dense(self.dim, kernel_init=_dense_init,
                            dtype=self.dtype, name='proj')(out)

        q = qkv[..., :self.dim].reshape(bnw, n, heads, hd)
        k = qkv[..., self.dim:2 * self.dim].reshape(bnw, n, heads, hd)
        v = qkv[..., 2 * self.dim:].reshape(bnw, n, heads, hd)

        attn = jnp.einsum('bnhd,bmhd->bhnm', q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = attn + bias[None].astype(attn.dtype)
        if region is not None:
            mask = jnp.asarray(np.where(
                np.asarray(region)[:, None, :]
                != np.asarray(region)[:, :, None],
                -100.0, 0.0).astype(np.float32))
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bnw, heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)

        out = jnp.einsum('bhnm,bmhd->bnhd', attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(bnw, n, c)
        return nn.Dense(self.dim, kernel_init=_dense_init, dtype=self.dtype, name='proj')(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_dense_init, dtype=self.dtype, name='fc1')(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, kernel_init=_dense_init, dtype=self.dtype, name='fc2')(x)


class _LNParams(nn.Module):
    """Owns LayerNorm parameters (same names/shapes/init as nn.LayerNorm)
    but returns them as values, for ops that consume the params directly
    (the fused MLP half-block kernel)."""
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param('scale', nn.initializers.ones, (self.dim,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        return scale, bias


class _DenseParams(nn.Module):
    """Owns Dense parameters (same names/shapes/init as the nn.Dense used
    in Mlp) but returns them as values."""
    in_dim: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', _dense_init,
                            (self.in_dim, self.features), jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _MlpParams(nn.Module):
    """Param twin of Mlp (children 'fc1'/'fc2' — identical variable tree)."""
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        k1, b1 = _DenseParams(self.dim, self.hidden, name='fc1')()
        k2, b2 = _DenseParams(self.hidden, self.dim, name='fc2')()
        return k1, b1, k2, b2


class _AttnParams(nn.Module):
    """Param twin of WindowAttention ('rel_bias_table' + children
    'qkv'/'proj' — identical variable tree), for the fused whole-block
    kernel that consumes the params directly."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self):
        table = self.param(
            'rel_bias_table', nn.initializers.truncated_normal(0.02),
            ((2 * WINDOW - 1) ** 2, self.num_heads), jnp.float32)
        wqkv, bqkv = _DenseParams(self.dim, 3 * self.dim, name='qkv')()
        wproj, bproj = _DenseParams(self.dim, self.dim, name='proj')()
        return table, wqkv, bqkv, wproj, bproj


def drop_path(x, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Per-sample stochastic depth (reference DropPath:62-80)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
    return x / keep * mask


class SwinBlock(nn.Module):
    """W-MSA / SW-MSA block (reference SwinTransformerBlock:203-289).
    Operates on NHWC; padding + masks are static for the config img_size."""
    dim: int
    num_heads: int
    shift: int
    drop_path_rate: float
    dtype: jnp.dtype = jnp.float32
    train: bool = False    # attribute, not call arg: nn.remat-friendly
    fused_attn: bool = False
    fused_attn_block: bool = False
    fused_mlp: bool = False
    fused_whole: bool = False  # BOTH halves as one Pallas pass

    @nn.compact
    def __call__(self, x):
        train = self.train
        b, h, w, c = x.shape
        det = not train
        if self.fused_whole and (det or self.drop_path_rate == 0.0):
            return self._whole_fused(x)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm1')(x)

        pad_b = (WINDOW - h % WINDOW) % WINDOW
        pad_r = (WINDOW - w % WINDOW) % WINDOW
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            region = shifted_window_regions(hp, wp)      # static numpy
        else:
            region = None

        windows = window_partition(x, WINDOW)
        attended = WindowAttention(self.dim, self.num_heads, dtype=self.dtype,
                                   fused=self.fused_attn,
                                   fused_block=self.fused_attn_block,
                                   name='attn')(windows, region)
        x = window_reverse(attended, WINDOW, hp, wp)

        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w, :]

        det = not train
        rng1 = self.make_rng('dropout') if (train and self.drop_path_rate > 0) else None
        x = shortcut + drop_path(x, self.drop_path_rate, det, rng1)
        # MLP half-block: fused single-pass kernel when stochastic depth is
        # inactive (ops/swin_mlp.py — the XLA lowering's ~14 HBM passes
        # dominate the block at large geometries); param tree is identical
        # either way (_LNParams/_MlpParams are variable twins of
        # nn.LayerNorm/Mlp).
        if self.fused_mlp and (det or self.drop_path_rate == 0.0):
            from yolact_minimal_tpu.ops.swin_mlp import mlp_block_fused
            ln_scale, ln_bias = _LNParams(self.dim, name='norm2')()
            k1, b1, k2, b2 = _MlpParams(self.dim, self.dim * 4, name='mlp')()
            flat = x.reshape(-1, c)
            return mlp_block_fused(flat, ln_scale, ln_bias,
                                   k1, b1, k2, b2).reshape(b, h, w, c)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm2')(x)
        y = Mlp(self.dim, self.dim * 4, dtype=self.dtype, name='mlp')(y)
        rng2 = self.make_rng('dropout') if (train and self.drop_path_rate > 0) else None
        return x + drop_path(y, self.drop_path_rate, det, rng2)

    def _whole_fused(self, x):
        """Both block halves as ONE Pallas pass (ops/swin_block.py): the
        tensor is read once and written once per block — only the pad/roll/
        partition and reverse/crop copies remain in XLA. Active when
        stochastic depth is inactive; param tree is identical to the unfused
        modules (_LNParams/_AttnParams/_MlpParams twins)."""
        from yolact_minimal_tpu.ops.swin_block import swin_block_fused
        b, h, w, c = x.shape
        ln1_s, ln1_b = _LNParams(self.dim, name='norm1')()
        table, wqkv, bqkv, wproj, bproj = _AttnParams(
            self.dim, self.num_heads, name='attn')()
        ln2_s, ln2_b = _LNParams(self.dim, name='norm2')()
        k1, b1, k2, b2 = _MlpParams(self.dim, self.dim * 4, name='mlp')()

        n = WINDOW * WINDOW
        idx = jnp.asarray(relative_position_index())
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1).astype(self.dtype)

        pad_b = (WINDOW - h % WINDOW) % WINDOW
        pad_r = (WINDOW - w % WINDOW) % WINDOW
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            region = jnp.asarray(
                shifted_window_regions(hp, wp).astype(np.int32))
        else:
            region = None
        rm = pad_rowmask(h, w, hp, wp, self.shift)
        rm = None if rm is None else jnp.asarray(rm)

        windows = window_partition(x.astype(self.dtype), WINDOW)
        y = swin_block_fused(windows, rm, ln1_s, ln1_b, wqkv, bqkv, bias,
                             region, wproj, bproj, ln2_s, ln2_b, k1, b1,
                             k2, b2, self.num_heads)
        y = window_reverse(y, WINDOW, hp, wp)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :h, :w, :]
        return y


class PatchMerging(nn.Module):
    """2x2 spatial concat -> LayerNorm -> Linear 4C->2C (reference
    PatchMerging:292-325; concat order x0,x1,x2,x3 preserved for checkpoint
    compatibility)."""
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = h + h % 2, w + w % 2
        # 2x2 decimation as reshape+transpose, NOT four strided slices
        # (x[:, 0::2, 0::2] etc.): on this TPU backend a stride-2 spatial
        # slice whose output row count is not a multiple of the bf16
        # sublane tile (e.g. 136 -> 68 rows at img_size 544) faults the
        # worker kernel — bisected in round 3 (probes/_swin_probe2.py); every
        # img_size <= 512 yields tile-aligned outputs and worked. The
        # channel order matches the reference concat [x0 x1 x2 x3] =
        # [(0,0), (1,0), (0,1), (1,1)] (row, col) offsets, i.e. col-major
        # over the 2x2 block -> transpose to [..., col, row, c].
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5)         # [B, h/2, w/2, col, row, c]
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='norm')(x)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=_dense_init,
                        dtype=self.dtype, name='reduction')(x)


class SwinStage(nn.Module):
    dim: int
    depth: int
    num_heads: int
    drop_path_rates: Sequence[float]
    downsample: bool
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    fused_attn: bool = False
    fused_attn_block: bool = False
    fused_mlp: bool = False
    fused_whole: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_cls = nn.remat(SwinBlock) if self.remat else SwinBlock
        for i in range(self.depth):
            x = block_cls(self.dim, self.num_heads,
                          shift=0 if i % 2 == 0 else WINDOW // 2,
                          drop_path_rate=self.drop_path_rates[i],
                          dtype=self.dtype, train=train,
                          fused_attn=self.fused_attn,
                          fused_attn_block=self.fused_attn_block,
                          fused_mlp=self.fused_mlp,
                          fused_whole=self.fused_whole,
                          name=f'block{i}')(x)
        down = PatchMerging(self.dim, dtype=self.dtype,
                            name='downsample')(x) if self.downsample else x
        return x, down


class SwinTiny(nn.Module):
    """Returns 4 NHWC feature maps (96, 192, 384, 768 ch at strides
    4/8/16/32); outputs 1-3 are LayerNormed (reference norm1..3,
    swin_transformer.py:482-484, 511-513)."""
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    drop_path_rate: float = 0.2
    dtype: jnp.dtype = jnp.float32
    remat: bool = False    # rematerialize each block in the backward pass
    fused_attn: bool = False   # Pallas fused window attention (TPU)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, _ = x.shape
        pad_b = (4 - h % 4) % 4
        pad_r = (4 - w % 4) % 4
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), padding='VALID',
                    dtype=self.dtype, name='patch_embed')(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='patch_norm')(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        outs = []
        off = 0
        for i, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** i)
            # Per-stage kernel choice (measured, v5e @544 b16): the
            # composed form — XLA qkv/proj Dense + the fused ATTENTION
            # kernel + the fused MLP half-block — wins END-TO-END at
            # stages 0-2 (r04: stage0 6.2->2.6, stage1 2.9->1.4, stage2
            # 1.2->1.0 ms vs plain XLA); stage 3 (24 heads, 9 windows) is
            # too small to amortize the attention kernel — XLA einsum wins.
            # The round-5 deeper fusions (attention half-block kernel,
            # whole-SwinBlock kernel) WIN their isolated A/Bs
            # (probes/_attn_block_probe.py, _swin_whole_probe.py) but LOSE
            # in the full detect graph — 295 / 293 img/s vs 311 at 544/b16
            # — because XLA fuses the composed path's LN/partition/Dense
            # glue across op boundaries that a mega-kernel forces into
            # serialized in-kernel VPU work. They remain validated,
            # SPMD-capable opt-ins (fused_attn_block / fused_whole). See
            # docs/ARCHITECTURE.md decision table.
            x_out, x = SwinStage(
                dim=dim, depth=depth, num_heads=self.num_heads[i],
                drop_path_rates=tuple(dpr[off:off + depth]),
                downsample=(i < len(self.depths) - 1),
                dtype=self.dtype, remat=self.remat,
                fused_attn=self.fused_attn and i < 3,
                fused_attn_block=False,
                fused_mlp=self.fused_attn,
                fused_whole=False,
                name=f'stage{i}')(x, train=train)
            off += depth
            if i in (1, 2, 3):
                x_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name=f'out_norm{i}')(x_out)
            outs.append(x_out)
        return tuple(outs)
