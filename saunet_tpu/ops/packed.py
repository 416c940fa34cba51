"""Lane-packed layout ops for narrow-channel full-resolution tensors.

Why this exists: TPU HBM stores the minor (lane) dimension of an array
padded to 128. Every full-resolution shape-stream tensor in SAUNet
(/root/reference/models/models.py:337-356 — 64/32/16/8/1-channel maps at
input resolution) is therefore stored 2x-128x larger than its nominal
size, and the train step pays that padded traffic on every conv read and
write, forward and backward. Fusing more aggressively inside one kernel
does not help (round-1 measurement: a fused Pallas shape-stream kernel
lost to XLA because the 128-lane padding is unavoidable *in that
layout*).

The fix is a layout change, expressed entirely in differentiable XLA so
autodiff, BatchNorm batch statistics, and GSPMD sharding keep working:

  pack P = 128 // C adjacent row pixels into the lane dimension:
      (B, H, W, C)  ->  (B, H, W/P, P*C)       lane l = p*C + c

  * elementwise ops are unchanged (lanes independent);
  * 1x1 convs become 128-wide block-diagonal matmuls (MXU-dense, vs
    a dense C-channel conv that pads its contraction dim to 128 on the
    MXU anyway);
  * 3x3 convs become a (3, 3)-window conv over (H, packed-column) with a
    block-placed (3, 3, P*C, P*C) kernel: the w-offset +-1 taps read the
    neighbouring packed column for the pack-edge pixels and the same
    column for interior pixels. FLOPs grow by 128/(C * true taps
    touched), but the op was HBM-bound by padding — trading idle MXU
    cycles for a P-fold traffic cut;
  * BatchNorm statistics per true channel are a strided-lane reduction
    (reshape 128 -> (P, C), reduce), and the affine is a tiled vector.

All packing/placement selectors are trace-time numpy constants; the
packed kernels are built from the *dense* kernels by einsum, so
gradients flow to the canonical parameter shapes and checkpoints are
layout-independent.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LANES = 128


def choose_pack(w: int, c: int, max_lanes: int = LANES) -> int:
    """Largest P with P | w and P*c <= max_lanes (1 if none better)."""
    best = 1
    for p in range(2, max_lanes // max(c, 1) + 1):
        if w % p == 0:
            best = p
    return best


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, W//p, p*C). Contiguous reshape."""
    if p == 1:
        return x
    b, h, w, c = x.shape
    assert w % p == 0, (w, p)
    return x.reshape(b, h, w // p, p * c)


def unpack(xp: jnp.ndarray, c: int) -> jnp.ndarray:
    """Inverse of pack: (B, H, V, p*C) -> (B, H, V*p, C)."""
    b, h, v, l = xp.shape
    assert l % c == 0, (l, c)
    return xp.reshape(b, h, v * (l // c), c)


# ---------------------------------------------------------------------------
# trace-time selector constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _sel_conv3x3(p: int):
    """M (3, 3, P, P): M[dv+1, dw+1, pi, po] = 1 where output pack-pixel po
    with true w-offset dw in {-1,0,1} reads input pack-pixel pi from the
    packed column at offset dv in {-1,0,1}."""
    m = np.zeros((3, 3, p, p), dtype=np.float32)
    for po in range(p):
        for dw in (-1, 0, 1):
            t = po + dw
            dv, pi = divmod(t, p)  # floor division: t=-1 -> dv=-1, pi=p-1
            m[dv + 1, dw + 1, pi, po] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _sel_increase(r: int, p_in: int, p_out: int):
    """S (r, p_in, p_out): output pack-pixel po reads input column kw = po
    // p_in at pack-pixel pi = po % p_in (p_out = r * p_in)."""
    s = np.zeros((r, p_in, p_out), dtype=np.float32)
    for po in range(p_out):
        s[po // p_in, po % p_in, po] = 1.0
    return s


@functools.lru_cache(maxsize=None)
def _sel_decrease(r: int, p_in: int, p_out: int):
    """S (r, p_in, p_out): the j-th output column of an input column group
    covers input pack-pixels [j*p_out, (j+1)*p_out) (p_in = r * p_out)."""
    s = np.zeros((r, p_in, p_out), dtype=np.float32)
    for j in range(r):
        for po in range(p_out):
            s[j, j * p_out + po, po] = 1.0
    return s


# ---------------------------------------------------------------------------
# packed conv ops
# ---------------------------------------------------------------------------

def _conv(xp, wp, strides):
    return jax.lax.conv_general_dilated(
        xp, wp, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_conv1x1(xp, kernel, c_in, p_in, c_out, p_out, bias=None):
    """1x1 conv C_in -> C_out on a packed tensor, repacking P_in -> P_out.

    kernel: (1, 1, C_in, C_out) or (C_in, C_out) dense flax kernel.
    P_out >= P_in: expressed as a (1, r)-window stride-r conv (r output
    pack-groups merge r input columns). P_out < P_in: an r-way split
    matmul whose outputs interleave back into columns by contiguous
    reshape.
    """
    if kernel.ndim == 4:
        kernel = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
    dt = xp.dtype
    k = kernel.astype(dt)
    if p_out == p_in:
        sel = jnp.asarray(_sel_increase(1, p_in, p_out), dt)[0]
        wp = jnp.einsum("pq,io->piqo", sel, k)
        out = jnp.einsum("bhvl,lm->bhvm",
                         xp, wp.reshape(p_in * c_in, p_out * c_out))
    elif p_out > p_in:
        r = p_out // p_in
        assert p_out == r * p_in, (p_in, p_out)
        sel = jnp.asarray(_sel_increase(r, p_in, p_out), dt)
        wp = jnp.einsum("wpq,io->wpiqo", sel, k).reshape(
            1, r, p_in * c_in, p_out * c_out)
        out = _conv(xp, wp, (1, r))
    else:
        r = p_in // p_out
        assert p_in == r * p_out, (p_in, p_out)
        sel = jnp.asarray(_sel_decrease(r, p_in, p_out), dt)
        wp = jnp.einsum("jpq,io->jpiqo", sel, k).reshape(
            r, p_in * c_in, p_out * c_out)
        out = jnp.einsum("bhvl,jlm->bhvjm", xp, wp)
        b, h, v = out.shape[:3]
        out = out.reshape(b, h, v * r, p_out * c_out)
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), p_out)
    return out


def packed_conv3x3(xp, kernel, c_in, p, c_out=None, bias=None):
    """3x3 SAME conv C_in -> C_out on a packed tensor (pack P unchanged).

    kernel: (3, 3, C_in, C_out) dense flax kernel. Lowered to one
    (3, 3)-window conv over (H, packed columns) with a block-placed
    (3, 3, P*C_in, P*C_out) kernel; SAME padding's zero column supplies
    the out-of-image taps exactly.
    """
    c_out = c_out if c_out is not None else kernel.shape[-1]
    dt = xp.dtype
    sel = jnp.asarray(_sel_conv3x3(p), dt)  # (kw, dw, pi, po)
    wp = jnp.einsum("hdio,wdpq->hwpiqo", kernel.astype(dt), sel)
    wp = wp.reshape(3, 3, p * c_in, p * c_out)
    out = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), p)
    return out


@functools.lru_cache(maxsize=None)
def _sel_conv3x3_mid(p: int):
    """M (3, P, P): the intra-column taps of _sel_conv3x3 — M[dw+1, pi, po]
    = 1 where output pack-pixel po reads input pack-pixel pi = po + dw of
    the SAME packed column (0 <= pi < p)."""
    m = np.zeros((3, p, p), dtype=np.float32)
    for po in range(p):
        for dw in (-1, 0, 1):
            pi = po + dw
            if 0 <= pi < p:
                m[dw + 1, pi, po] = 1.0
    return m


def packed_conv3x3_split(xp, kernel, c_in, p, c_out=None, bias=None):
    """packed_conv3x3 with the cross-column taps split out — same math,
    2/3 the MAC count (VERDICT r4 task #3, the stream-res1 lever).

    The standard lowering's (3, 3, P*C, P*C) block-placed kernel performs
    P x the useful MACs (each window column's 128x128 matmul is 1/P
    non-zero blocks averaged over the 3 columns). Splitting by tap
    locality:

      * mid: taps whose input pixel lies in the SAME packed column
        (pi = po + dw in range) — a (3, 1)-window conv whose middle
        128x128 kernel is maximally dense;
      * cross: only the two pack-EDGE taps leave the column (po=0 needs
        true pixel p*v-1; po=p-1 needs p*v+p). ONE shifted companion
        tensor xs[v] = (last pixel of column v-1, first pixel of column
        v+1) — (B, H, V, 2*C), full-lane at P*C=128 — feeds a
        (3, 1)-window conv with a 2-block kernel.

    MACs per output column: 3*(P*C)^2 + 3*(2C)*(P*C) vs the standard
    9*(P*C)^2 — for P=2 exactly 2/3. The price is materialising xs
    (one extra full-res packed read+write). Only legal for P >= 2."""
    c_out = c_out if c_out is not None else kernel.shape[-1]
    assert p >= 2, p
    dt = xp.dtype
    k = kernel.astype(dt)
    # mid: intra-column taps, (3, 1) window over (H, packed columns)
    mid = jnp.asarray(_sel_conv3x3_mid(p), dt)  # (dw, pi, po)
    wmid = jnp.einsum("hdio,dpq->hpiqo", k, mid)
    wmid = wmid.reshape(3, 1, p * c_in, p * c_out)
    out = jax.lax.conv_general_dilated(
        xp, wmid, window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # cross: pack-edge taps via the shifted companion tensor
    left = jnp.pad(xp[:, :, :-1, (p - 1) * c_in:],
                   ((0, 0), (0, 0), (1, 0), (0, 0)))   # true pixel p*v - 1
    right = jnp.pad(xp[:, :, 1:, :c_in],
                    ((0, 0), (0, 0), (0, 1), (0, 0)))  # true pixel p*v + p
    xs = jnp.concatenate([left, right], axis=-1)       # (B, H, V, 2*C_in)
    wcross = jnp.zeros((3, 1, 2 * c_in, p, c_out), dt)
    wcross = wcross.at[:, 0, :c_in, 0, :].set(k[:, 0])        # dw=-1 -> po=0
    wcross = wcross.at[:, 0, c_in:, p - 1, :].set(k[:, 2])    # dw=+1 -> po=P-1
    out = out + jax.lax.conv_general_dilated(
        xs, wcross.reshape(3, 1, 2 * c_in, p * c_out),
        window_strides=(1, 1), padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), p)
    return out


@functools.lru_cache(maxsize=None)
def _sel_conv3x3_to_packed(p: int):
    """S (p + 2, 3, p): S[kw, dw+1, po] = 1 where output pack-pixel po with
    true w-offset dw in {-1, 0, 1} reads window column kw = po + dw + 1 of
    a width-(p+2) stride-p window anchored one column left of the pack."""
    s = np.zeros((p + 2, 3, p), dtype=np.float32)
    for po in range(p):
        for dw in (-1, 0, 1):
            s[po + dw + 1, dw + 1, po] = 1.0
    return s


def conv3x3_dense_to_packed(x, kernel, p, c_out=None, bias=None):
    """3x3 SAME conv from a DENSE (B, H, W, C_in) input straight into the
    packed (B, H, W/P, P*C_out) layout — for channel-narrowing convs whose
    dense output would lane-pad (C_out < 128) while the input is lane-full.

    One (3, P+2)-window stride-(1, P) conv: the input is read ONCE (no
    per-parity strided convs, no dense intermediate), the output is written
    packed. Kernel taps beyond each output pixel's 3x3 support are exact
    zeros; FLOPs grow by (P+2)/3 — idle MXU columns traded for the P-fold
    cut in output-side HBM traffic, the same bargain as packed_conv3x3.

    kernel: (3, 3, C_in, C_out) dense flax kernel. `x` may also be a
    channel-split part list [(x_i, c_i), ...] of dense tensors (the
    decoder's skip/up pair): conv(concat(parts)) is computed as the sum of
    per-part convs with the kernel sliced along its input-channel axis, so
    the concat tensor never reaches HBM either.
    """
    if isinstance(x, (list, tuple)):
        out, off = None, 0
        for xi, ci in x:
            y = conv3x3_dense_to_packed(
                xi, kernel[:, :, off:off + ci, :], p, c_out)
            out = y if out is None else out + y
            off += ci
        assert off == kernel.shape[2], (off, kernel.shape)
        if bias is not None:
            out = out + jnp.tile(bias.astype(out.dtype), p)
        return out
    c_out = c_out if c_out is not None else kernel.shape[-1]
    if p == 1:
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        assert x.shape[2] % p == 0, (x.shape, p)
        dt = x.dtype
        sel = jnp.asarray(_sel_conv3x3_to_packed(p), dt)  # (kw, dw, po)
        wp = jnp.einsum("hdio,wdq->hwiqo", kernel.astype(dt), sel)
        wp = wp.reshape(3, p + 2, kernel.shape[2], p * c_out)
        out = jax.lax.conv_general_dilated(
            x, wp, window_strides=(1, p), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + jnp.tile(bias.astype(out.dtype), p)
    return out


def packed_channel_mean(xp, c):
    """Per-true-channel global mean over (H, W) of a packed tensor:
    (B, H, W/P, P*C) -> (B, C), f32 accumulation (the squeeze of an SE
    block, computed without unpacking)."""
    b, h, v, l = xp.shape
    p = l // c
    x32 = xp.astype(jnp.float32).reshape(b, h, v, p, c)
    return jnp.mean(x32, axis=(1, 2, 3))


def repack(xp, c, p_in, p_out):
    """Change pack factor only (channel count kept)."""
    if p_in == p_out:
        return xp
    eye = jnp.eye(c, dtype=xp.dtype)
    return packed_conv1x1(xp, eye, c, p_in, c, p_out)


def broadcast_1ch(xp, p_in, c_out, p_out):
    """1-channel packed map -> packed (C_out, P_out) tensor with the pixel
    value replicated across all C_out lanes (for gating multiplies).
    Requires P_in divisible by P_out (cue packs are always the largest)."""
    dt = xp.dtype
    ones = jnp.ones((1, c_out), dt)
    if p_in == p_out:
        sel = jnp.asarray(_sel_increase(1, p_in, p_out), dt)[0]
        wp = jnp.einsum("pq,io->piqo", sel, ones)
        return jnp.einsum("bhvl,lm->bhvm",
                          xp, wp.reshape(p_in, p_out * c_out))
    r = p_in // p_out
    assert p_in == r * p_out, (p_in, p_out)
    sel = jnp.asarray(_sel_decrease(r, p_in, p_out), dt)
    wp = jnp.einsum("jpq,io->jpiqo", sel, ones).reshape(
        r, p_in, p_out * c_out)
    out = jnp.einsum("bhvl,jlm->bhvjm", xp, wp)
    b, h, v = out.shape[:3]
    return out.reshape(b, h, v * r, p_out * c_out)


@functools.lru_cache(maxsize=None)
def _sel_convtr4x2(p_in: int, p_out: int):
    """Placement for the k=4/s=2/p=1 transposed conv (torch semantics,
    out[o] = sum_{i,k: o = 2i + k - 1} x[i] * K[k]) on packed columns.

    Returns M (2, 2, 3, P_in, P_out, 4, 4): [h-parity j, h-tap t, w-col
    offset u, in pack-pixel, out pack-pixel, kh, kw] one-hot."""
    m = np.zeros((2, 2, 3, p_in, p_out, 4, 4), dtype=np.float32)
    kh_for = {0: (3, 1), 1: (2, 0)}  # parity -> (upper-row tap, lower)
    for j in (0, 1):
        for t in (0, 1):
            kh = kh_for[j][t]
            for u in (0, 1, 2):
                for pi in range(p_in):
                    for po in range(p_out):
                        kw = po - 2 * (p_in * (u - 1) + pi) + 1
                        if 0 <= kw < 4:
                            m[j, t, u, pi, po, kh, kw] = 1.0
    return m


def packed_convtr4x2(xp, kernel, c_in, p_in, c_out, bias=None):
    """Transposed conv (kernel 4x4, stride 2, torch padding=1 — i.e. the
    exact-2x upsampler of flax ConvTranspose(k=4, s=2, 'SAME')) on a
    packed tensor. Output pack is 2*P_in (width doubles, channel count
    drops), H parity computed as two window-(2, 3) convs whose rows
    interleave by contiguous reshape.

    kernel: (4, 4, C_in, C_out) dense flax ConvTranspose kernel."""
    p_out = 2 * p_in
    b, h, v, _ = xp.shape
    dt = xp.dtype
    sel = jnp.asarray(_sel_convtr4x2(p_in, p_out), dt)
    # lax.conv_transpose (flax ConvTranspose) does not flip the kernel, so
    # its tap indexing is the spatial mirror of the torch-semantics
    # formula the selector encodes.
    kernel = kernel[::-1, ::-1]
    # (j, t, u, pi, po, kh, kw) x (kh, kw, ci, co) -> (j, t, u, pi*ci, po*co)
    wp = jnp.einsum("jtupqhw,hwio->jtupiqo", sel, kernel.astype(dt))
    wp = wp.reshape(2, 2, 3, p_in * c_in, p_out * c_out)
    pads = (((1, 0), (1, 1)), ((0, 1), (1, 1)))
    ys = [
        jax.lax.conv_general_dilated(
            xp, wp[j], window_strides=(1, 1), padding=pads[j],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        for j in (0, 1)
    ]
    out = jnp.stack(ys, axis=2).reshape(b, 2 * h, v, p_out * c_out)
    if bias is not None:
        out = out + jnp.tile(bias.astype(dt), p_out)
    return out


# ---------------------------------------------------------------------------
# packed batch norm pieces
# ---------------------------------------------------------------------------

def packed_bn_stats(xp, c, axis_name=None):
    """Per-true-channel (mean, var) over (B, H, W) of a packed tensor.
    f32 accumulation; var = E[x^2] - E[x]^2 (flax use_fast_variance).
    `axis_name`: explicit pmean under shard_map (flax BatchNorm parity)."""
    b, h, v, l = xp.shape
    p = l // c
    x32 = xp.astype(jnp.float32).reshape(b, h, v, p, c)
    n = b * h * v * p
    mean = jnp.sum(x32, axis=(0, 1, 2, 3)) / n
    mean2 = jnp.sum(jnp.square(x32), axis=(0, 1, 2, 3)) / n
    if axis_name is not None:
        mean = jax.lax.pmean(mean, axis_name)
        mean2 = jax.lax.pmean(mean2, axis_name)
    var = mean2 - jnp.square(mean)
    return mean, var


def packed_scale_bias(xp, scale_c, bias_c, c):
    """Apply a per-true-channel affine (scale, bias vectors of length C)."""
    p = xp.shape[-1] // c
    dt = xp.dtype
    return xp * jnp.tile(scale_c.astype(dt), p) + jnp.tile(
        bias_c.astype(dt), p)


def packed_argmax(xp, c):
    """Per-pixel argmax over the C classes of packed logits
    (N, H, W/P, P*C) -> (N, H, W) int32, first-max-wins (jnp.argmax
    semantics). Lane rolls + selector matmuls on the packed tensor —
    never materialises the lane-padded (N, H, W, C) layout."""
    n, h, v, lanes = xp.shape
    p = lanes // c
    x = xp.astype(jnp.float32)
    m = x
    for sh in range(1, c):
        m = jnp.maximum(m, jnp.roll(x, -sh, axis=-1))
    # group-start lanes now hold their group's max (cyclic contamination
    # only ever reaches lanes past the group start)
    first = np.zeros((lanes, p), dtype=np.float32)
    for pix in range(p):
        first[pix * c, pix] = 1.0
    sel_first = jnp.asarray(first)
    grp = np.kron(np.eye(p, dtype=np.float32), np.ones((c, 1), np.float32))
    sel_grp = jnp.asarray(grp)  # (lanes, p): lane -> its pixel
    mx = (m @ sel_first) @ sel_grp.T
    cls = jnp.tile(jnp.arange(c, dtype=jnp.float32), p)
    cand = jnp.where(x >= mx, cls, float(c))
    mn = cand
    for sh in range(1, c):
        mn = jnp.minimum(mn, jnp.roll(cand, -sh, axis=-1))
    preds = mn @ sel_first  # (n, h, v, p)
    return preds.reshape(n, h, v * p).astype(jnp.int32)


# ---------------------------------------------------------------------------
# resize directly into packed layout
# ---------------------------------------------------------------------------

def resize_bilinear_packed(x, out_hw, p, align_corners: bool = True):
    """resize_bilinear (align-corners matrix form, see ops/resize.py) whose
    W-interpolation einsum writes the packed (B, H_out, W_out/P, P*C)
    layout directly — the full-resolution unpacked intermediate never
    exists in HBM."""
    from .resize import _interp_matrix

    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    b, h, w, c = x.shape
    dt = x.dtype
    cast = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    prec = None if dt == jnp.bfloat16 else jax.lax.Precision.HIGHEST
    xf = x.astype(cast)
    if h != out_h:  # H first: runs at the narrow input W
        ah = jnp.asarray(_interp_matrix(h, out_h, align_corners), cast)
        xf = jnp.einsum("Oh,nhwc->nOwc", ah, xf, precision=prec)
    aw = jnp.asarray(_interp_matrix(w, out_w, align_corners), cast)
    aw = aw.reshape(out_w // p, p, w)
    out = jnp.einsum("vpw,nhwc->nhvpc", aw, xf, precision=prec)
    return out.reshape(b, out_h, out_w // p, p * c).astype(dt)
