"""H.264 inter (P-slice) tier: P_Skip, motion-vector prediction,
qpel/hpel motion compensation, inter residuals, and the picture/slice
decode entry points.  Split out of the codecs monolith in r12;
behavior unchanged."""

from __future__ import annotations

import math
import struct

import numpy as np
from .bits import (
    _EgBitReader,
    _EgBitWriter,
    _insert_emulation,
    _strip_emulation,
)
from .h264 import (
    _H264_BLK_ORDER,
    _H264_DC_V0,
    _H264_ZIGZAG_4x4,
    _H2X2,
    _h264_ac_dequant,
    _h264_chroma_qp,
    _h264_inv_core4,
    _h264_planes_to_rgb,
    cavlc_decode_block,
    cavlc_encode_block,
    decode_h264_islice,
    decode_h264_islice_planes,
)

def encode_h264_pskip(width: int, height: int, frame_num: int) -> bytes:
    """One NON-REFERENCE P slice NAL (nal_ref_idc=0, type=1) of all
    skipped macroblocks: an exact repeat of the current reference
    frame (the preceding IDR in this library's output).  frame_num
    counts mod 16 (the SPS's log2_max_frame_num = 4)."""
    n_mbs = ((width + 15) // 16) * ((height + 15) // 16)
    w = _EgBitWriter()
    w.write(0x01, 8)                    # NAL: ref_idc=0, type=1
    w.ue(0)                             # first_mb_in_slice
    w.ue(0)                             # slice_type: P
    w.ue(0)                             # pic_parameter_set_id
    w.write(frame_num % 16, 4)          # frame_num
    w.write(0, 1)                       # num_ref_idx_active_override
    w.write(0, 1)                       # ref_pic_list_modification_l0
    # nal_ref_idc == 0 → no dec_ref_pic_marking
    w.se(0)                             # slice_qp_delta
    w.ue(n_mbs)                         # mb_skip_run = every macroblock
    body = w.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


def _h264_mvp_16x16(mvs: dict, mbx: int, mby: int, mbw: int) -> tuple:
    """§8.4.1.3 motion-vector prediction for a 16×16 partition in an
    all-inter-ref0 P picture: neighbors A (left), B (above), C
    (above-right, D above-left substituted when C is unavailable —
    §8.4.1.3.2).  With every coded neighbor carrying refIdx 0, the
    spec's 'exactly one neighbor matches the reference' rule reduces to
    'exactly one neighbor available'; otherwise the component-wise
    median with unavailable neighbors as (0, 0)."""
    def nb(x, y):
        if x < 0 or y < 0 or x >= mbw:
            return None
        return mvs.get((x, y))
    a = nb(mbx - 1, mby)
    b = nb(mbx, mby - 1)
    c = nb(mbx + 1, mby - 1)
    if c is None:
        c = nb(mbx - 1, mby - 1)
    avail = [v for v in (a, b, c) if v is not None]
    if len(avail) == 1:
        return avail[0]
    va, vb, vc = a or (0, 0), b or (0, 0), c or (0, 0)
    return (sorted((va[0], vb[0], vc[0]))[1],
            sorted((va[1], vb[1], vc[1]))[1])


def _h264_pskip_mv(mvs: dict, mbx: int, mby: int, mbw: int) -> tuple:
    """§8.4.1.1 P_Skip motion vector: (0, 0) when A or B is unavailable
    or either is a zero-motion ref0 macroblock, else the 16×16 MV
    prediction — the rule that makes a whole-frame skip chain an exact
    repeat AND lets skips ride a moving neighborhood."""
    a = mvs.get((mbx - 1, mby)) if mbx > 0 else None
    b = mvs.get((mbx, mby - 1)) if mby > 0 else None
    if a is None or b is None or a == (0, 0) or b == (0, 0):
        return (0, 0)
    return _h264_mvp_16x16(mvs, mbx, mby, mbw)


def encode_h264_pmv(width: int, height: int, frame_num: int,
                    mv: tuple = (0, 0), mvs: np.ndarray | None = None,
                    nal_ref_idc: int = 2) -> bytes:
    """One P slice NAL of P_L0_16x16 macroblocks with explicit motion
    vectors (QUARTER-PEL units, spec sign convention: the prediction of
    sample (x, y) is reference sample (x + mvx/4, y + mvy/4)) and no
    residuals (coded_block_pattern = 0) — the MOTION-COMPENSATED inter
    tier (r11, VERDICT r10 ask #3): a conformant translational-motion
    picture any player decodes.  ``mv`` applies to every macroblock;
    ``mvs`` (mb_rows, mb_cols, 2) gives per-MB vectors.  mvd values are
    computed against the same §8.4.1.3 prediction the decoder runs.
    ``nal_ref_idc=2`` marks the picture as a reference so P chains
    compose."""
    mbw, mbh = (width + 15) // 16, (height + 15) // 16
    if mvs is None:
        grid = np.tile(np.asarray(mv, dtype=np.int64), (mbh, mbw, 1))
    else:
        grid = np.asarray(mvs, dtype=np.int64)
        if grid.shape != (mbh, mbw, 2):
            raise ValueError(f"mvs must be ({mbh}, {mbw}, 2)")
    w = _EgBitWriter()
    w.write((nal_ref_idc << 5) | 1, 8)  # NAL header, type 1 (non-IDR)
    w.ue(0)                             # first_mb_in_slice
    w.ue(0)                             # slice_type: P
    w.ue(0)                             # pic_parameter_set_id
    w.write(frame_num % 16, 4)          # frame_num (log2_max = 4)
    w.write(0, 1)                       # num_ref_idx_active_override
    w.write(0, 1)                       # ref_pic_list_modification_l0
    if nal_ref_idc:
        w.write(0, 1)                   # adaptive_ref_pic_marking = 0
    w.se(0)                             # slice_qp_delta
    done: dict = {}
    for mby in range(mbh):
        for mbx in range(mbw):
            w.ue(0)                     # mb_skip_run
            w.ue(0)                     # mb_type P_L0_16x16
            mvp = _h264_mvp_16x16(done, mbx, mby, mbw)
            cur = (int(grid[mby, mbx, 0]), int(grid[mby, mbx, 1]))
            w.se(cur[0] - mvp[0])       # mvd_l0 x
            w.se(cur[1] - mvp[1])       # mvd_l0 y
            w.ue(0)                     # coded_block_pattern (inter: 0)
            done[(mbx, mby)] = cur
    body = w.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


# coded_block_pattern me(v) mapping for INTER macroblocks, ChromaArrayType
# 1 (T-REC-H.264 Table 9-4, the Inter column): codeNum → cbp.  cbp 15
# (all four luma 8x8 groups, no chroma) is codeNum 11 — the pattern this
# module's residual encoder emits.
_H264_CBP_INTER = (
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
_H264_CBP_INTER_ENC = {v: i for i, v in enumerate(_H264_CBP_INTER)}


def encode_h264_pres(width: int, height: int, frame_num: int,
                     mv: tuple = (0, 0),
                     residuals: np.ndarray | None = None,
                     chroma_residuals: tuple | None = None,
                     qp: int = 28, nal_ref_idc: int = 2) -> bytes:
    """One P slice NAL of P_L0_16x16 macroblocks carrying BOTH motion
    vectors and CODED LUMA RESIDUALS (r11, third wave — the tier past
    encode_h264_pmv's residual-free inter): coded_block_pattern = 15
    (all four 8x8 luma groups), each 4x4 block holding a single
    quantized DC-position coefficient, so every macroblock adds the
    UNIFORM per-MB residual ``residuals[mby, mbx]`` to its motion-
    compensated prediction.  At qp=28 the §8.5.12 dequant + inverse
    core transform make a DC-only coefficient c an exact uniform
    residual of 4·c per pixel ((256·c + 32) >> 6), so residual values
    must be multiples of 4 — the closed form the gate oracle replays.
    Single-coefficient blocks keep every CAVLC nC context < 2 (the
    documented table scope: nA, nB ≤ 1 ⇒ nC ≤ 1).

    ``chroma_residuals=(rb, rr)`` additionally codes UNIFORM chroma
    residuals (cbp_chroma = 1, the ChromaDCLevel-only route): one
    DC-position coefficient v per 2x2 chroma DC block under the
    nC == -1 CAVLC context — at qp=28 (QPc = 28) the §8.5.11 chroma DC
    dequant makes the per-pixel chroma residual exactly 2·v, so rb/rr
    must be multiples of 2."""
    if qp != 28:
        raise NotImplementedError("inter residual encoder: qp=28 only "
                                  "(the identity-form dequant step)")
    mbw, mbh = (width + 15) // 16, (height + 15) // 16
    if residuals is None:
        res = np.zeros((mbh, mbw), dtype=np.int64)
    else:
        res = np.asarray(residuals, dtype=np.int64)
        if res.shape != (mbh, mbw):
            raise ValueError(f"residuals must be ({mbh}, {mbw})")
    if (res % 4).any():
        raise ValueError("residual values must be multiples of 4 "
                         "(DC-only qp=28 step size)")
    levels = res // 4
    if np.abs(levels).max() > 64:
        raise ValueError("|residual| > 256 exceeds the useful range")
    cb_v = cr_v = None
    if chroma_residuals is not None:
        rb, rr = int(chroma_residuals[0]), int(chroma_residuals[1])
        if rb % 2 or rr % 2:
            raise ValueError("chroma residual values must be multiples "
                             "of 2 (DC-only qp=28 step size)")
        if max(abs(rb), abs(rr)) > 128:
            raise ValueError("|chroma residual| > 128 exceeds the "
                             "useful range")
        cb_v, cr_v = rb // 2, rr // 2
    cbp = 15 | (16 if chroma_residuals is not None else 0)
    w = _EgBitWriter()
    w.write((nal_ref_idc << 5) | 1, 8)  # NAL header, type 1 (non-IDR)
    w.ue(0)                             # first_mb_in_slice
    w.ue(0)                             # slice_type: P
    w.ue(0)                             # pic_parameter_set_id
    w.write(frame_num % 16, 4)          # frame_num (log2_max = 4)
    w.write(0, 1)                       # num_ref_idx_active_override
    w.write(0, 1)                       # ref_pic_list_modification_l0
    if nal_ref_idc:
        w.write(0, 1)                   # adaptive_ref_pic_marking = 0
    w.se(qp - 26)                       # slice_qp_delta (pps init 26)
    done: dict = {}
    for mby in range(mbh):
        for mbx in range(mbw):
            w.ue(0)                     # mb_skip_run
            w.ue(0)                     # mb_type P_L0_16x16
            mvp = _h264_mvp_16x16(done, mbx, mby, mbw)
            w.se(mv[0] - mvp[0])        # mvd_l0 x
            w.se(mv[1] - mvp[1])        # mvd_l0 y
            done[(mbx, mby)] = (int(mv[0]), int(mv[1]))
            w.ue(_H264_CBP_INTER_ENC[cbp])  # coded_block_pattern
            w.se(0)                     # mb_qp_delta
            c = int(levels[mby, mbx])
            blk = [c] + [0] * 15        # DC-position-only 4x4
            for _b in range(16):        # luma4x4BlkIdx 0..15
                cavlc_encode_block(w, blk)
            if cb_v is not None:        # ChromaDCLevel: Cb then Cr
                cavlc_encode_block(w, [cb_v, 0, 0, 0], chroma_dc=True)
                cavlc_encode_block(w, [cr_v, 0, 0, 0], chroma_dc=True)
    body = w.bytes_aligned()
    return body[:1] + _insert_emulation(body[1:])


def _parse_p_slice_tail(r: "_EgBitReader", nal_ref_idc: int, stype: int,
                        width: int, height: int) -> tuple:
    """Slice-header tail + slice data of a P slice (reader positioned
    after slice_type): returns ``(mvs, res, cres)`` — the (mbx, mby) →
    (mvx, mvy) quarter-pel motion field, the decoded LUMA residual
    plane (padded (mh, mw) int64, None when no luma cbp bit is set
    anywhere), and the (Cb, Cr) chroma residual planes (padded
    (mh/2, mw/2) int64 each, None when every cbp_chroma is 0).  Shared
    by the RGB route (decode_h264_slice) and the plane route
    (decode_h264_picture)."""
    if stype % 5 != 0:
        raise NotImplementedError(
            "H264: only I and P slices decode natively "
            "(B prediction needs ffmpeg)")
    r.ue()                              # pic_parameter_set_id
    r.read(4)                           # frame_num
    r.read(1)                           # num_ref_idx_active_override
    r.read(1)                           # ref_pic_list_modification_l0
    if nal_ref_idc:
        if r.read(1):                   # adaptive_ref_pic_marking
            raise NotImplementedError(
                "H264: adaptive reference marking needs ffmpeg")
    qp = 26 + r.se()                    # slice_qp_delta over pps init
    mbw, mbh = (width + 15) // 16, (height + 15) // 16
    n_mbs = mbw * mbh
    mvs: dict = {}
    res = None                          # lazy (mh, mw) luma residuals
    cres = None                         # lazy (Cb, Cr) chroma residuals
    # per-4x4 TotalCoeff grid (4*mbh rows x 4*mbw cols) for the CAVLC
    # nC context: nC = nA / nB / (nA+nB+1)>>1 per availability (§9.2.1)
    ncg = np.zeros((4 * mbh, 4 * mbw), dtype=np.int64)
    i = 0
    while i < n_mbs:
        skip_run = r.ue()               # §7.3.4: skip run before each MB
        if skip_run > n_mbs - i:
            raise ValueError("H264: mb_skip_run overruns the picture")
        for _ in range(skip_run):
            mbx, mby = i % mbw, i // mbw
            mvs[(mbx, mby)] = _h264_pskip_mv(mvs, mbx, mby, mbw)
            i += 1
        if i >= n_mbs:
            break
        mb_type = r.ue()
        if mb_type != 0:
            raise NotImplementedError(
                f"H264: P mb_type {mb_type} needs ffmpeg (only "
                "P_L0_16x16 and P_Skip decode natively — sub-partitions "
                "and intra-in-P remain the seam)")
        mbx, mby = i % mbw, i // mbw
        mvp = _h264_mvp_16x16(mvs, mbx, mby, mbw)
        mvd = (r.se(), r.se())
        cbp = _H264_CBP_INTER[r.ue()]   # me(v), Table 9-4 Inter column
        if cbp >> 4 == 2:
            raise NotImplementedError(
                "H264: inter chroma AC residuals remain the seam "
                "(cbp_chroma == 2; DC-only cbp_chroma == 1 decodes)")
        if cbp:
            qp += r.se()                # mb_qp_delta
            if cbp & 15 and res is None:
                res = np.zeros((16 * mbh, 16 * mbw), dtype=np.int64)
            for b8 in range(4):
                if not (cbp >> b8) & 1:
                    continue
                for b4 in range(4):
                    by, bx = _H264_BLK_ORDER[4 * b8 + b4]
                    gy, gx = 4 * mby + by, 4 * mbx + bx
                    # §9.2.1 nC from decoded-neighbor TotalCoeff
                    na = int(ncg[gy, gx - 1]) if gx > 0 else None
                    nb = int(ncg[gy - 1, gx]) if gy > 0 else None
                    if na is not None and nb is not None:
                        nc = (na + nb + 1) >> 1
                    else:
                        nc = na if na is not None else (nb or 0)
                    if nc >= 2:
                        raise NotImplementedError(
                            "H264: CAVLC nC >= 2 contexts remain the "
                            "seam (this decoder's table is the nC < 2 "
                            "column)")
                    levels = cavlc_decode_block(r, 16)
                    ncg[gy, gx] = sum(1 for v in levels if v)
                    c4 = np.zeros((4, 4), dtype=np.int64)
                    for lv, (zi, zj) in zip(levels, _H264_ZIGZAG_4x4):
                        c4[zi, zj] = lv
                    d = _h264_ac_dequant(c4, qp)
                    y0, x0 = 16 * mby + 4 * by, 16 * mbx + 4 * bx
                    res[y0:y0 + 4, x0:x0 + 4] = \
                        (_h264_inv_core4(d) + 32) >> 6
            if cbp >> 4:                # ChromaDCLevel (§8.5.11): 2x2
                if cres is None:        # Hadamard + DC-only dequant
                    cres = (np.zeros((8 * mbh, 8 * mbw), dtype=np.int64),
                            np.zeros((8 * mbh, 8 * mbw), dtype=np.int64))
                qpc = _h264_chroma_qp(qp)
                for pi in (0, 1):       # Cb then Cr
                    lv = cavlc_decode_block(r, 4, chroma_dc=True)
                    c2 = np.array([[lv[0], lv[1]], [lv[2], lv[3]]],
                                  dtype=np.int64)
                    f2 = _H2X2 @ c2 @ _H2X2
                    dcc = (f2 * (16 * _H264_DC_V0[qpc % 6])
                           << (qpc // 6)) >> 5
                    for by in range(2):
                        for bx in range(2):
                            val = (int(dcc[by, bx]) + 32) >> 6
                            cres[pi][8 * mby + 4 * by:
                                     8 * mby + 4 * by + 4,
                                     8 * mbx + 4 * bx:
                                     8 * mbx + 4 * bx + 4] = val
        mvs[(mbx, mby)] = (mvp[0] + mvd[0], mvp[1] + mvd[1])
        i += 1
    if r.read(1) != 1:
        raise ValueError("H264: missing rbsp stop bit after slice data")
    return mvs, res, cres


H264_QPEL_TAPS = (1, -5, 20, 20, -5, 1)   # §8.4.2.2.1 6-tap filter


def _h264_luma_block(refY: np.ndarray, y0: int, x0: int,
                     mvx: int, mvy: int, bh: int = 16,
                     bw: int = 16) -> np.ndarray:
    """§8.4.2.2.1 quarter-sample luma prediction for one block:
    half-pel via the (1,−5,20,20,−5,1)/32 filter (the 2-D center
    position keeps unclipped intermediates and divides by 1024),
    quarter-pel as the rounded average of the two nearest integer/half
    positions (Table 8-12), reference coordinates clamped to the
    padded picture."""
    H, W = refY.shape
    ix, iy = mvx >> 2, mvy >> 2         # floor for negatives
    fx, fy = mvx & 3, mvy & 3
    # (bh+6, bw+6) window: 2 taps above/left, 3 below/right, +1 for
    # the next-integer / next-half neighbors Table 8-12 averages with
    rows = np.clip(np.arange(y0 + iy - 2, y0 + iy + bh + 4), 0, H - 1)
    cols = np.clip(np.arange(x0 + ix - 2, x0 + ix + bw + 4), 0, W - 1)
    win = refY[np.ix_(rows, cols)].astype(np.int64)
    t = H264_QPEL_TAPS

    def conv_x(a):                      # unclipped horizontal taps
        return sum(c * a[:, i:i + a.shape[1] - 5]
                   for i, c in enumerate(t))

    def conv_y(a):                      # unclipped vertical taps
        return sum(c * a[i:i + a.shape[0] - 5, :]
                   for i, c in enumerate(t))

    def clip8(a):
        return np.clip(a, 0, 255)

    G = win[2:2 + bh + 1, 2:2 + bw + 1]           # (bh+1, bw+1)
    b_raw = conv_x(win)                           # (bh+6, bw+1)
    h_raw = conv_y(win)                           # (bh+1, bw+6)
    b = clip8((b_raw[2:2 + bh + 1, :] + 16) >> 5)  # (bh+1, bw+1)
    hh = clip8((h_raw[:, 2:2 + bw + 1] + 16) >> 5)  # (bh+1, bw+1)
    if fx != 0 and fy != 0:
        j = clip8((conv_y(b_raw) + 512) >> 10)    # (bh+1, bw+1)
    # region views at the output block (top-left) and the +1 shifts
    Gb = G[:bh, :bw]
    Hn = G[:bh, 1:bw + 1]                         # integer right
    Mn = G[1:bh + 1, :bw]                         # integer below
    b0 = b[:bh, :bw]
    s0 = b[1:bh + 1, :bw]                         # half-horiz, next row
    h0 = hh[:bh, :bw]
    m0 = hh[:bh, 1:bw + 1]                        # half-vert, next col
    if fx != 0 and fy != 0:
        j0 = j[:bh, :bw]
    pos = (fx, fy)
    if pos == (0, 0):
        out = Gb
    elif pos == (1, 0):
        out = (Gb + b0 + 1) >> 1
    elif pos == (2, 0):
        out = b0
    elif pos == (3, 0):
        out = (b0 + Hn + 1) >> 1
    elif pos == (0, 1):
        out = (Gb + h0 + 1) >> 1
    elif pos == (0, 2):
        out = h0
    elif pos == (0, 3):
        out = (h0 + Mn + 1) >> 1
    elif pos == (1, 1):
        out = (b0 + h0 + 1) >> 1
    elif pos == (3, 1):
        out = (b0 + m0 + 1) >> 1
    elif pos == (1, 3):
        out = (h0 + s0 + 1) >> 1
    elif pos == (3, 3):
        out = (m0 + s0 + 1) >> 1
    elif pos == (2, 1):
        out = (b0 + j0 + 1) >> 1
    elif pos == (1, 2):
        out = (h0 + j0 + 1) >> 1
    elif pos == (2, 2):
        out = j0
    elif pos == (3, 2):
        out = (j0 + m0 + 1) >> 1
    else:                               # (2, 3)
        out = (j0 + s0 + 1) >> 1
    return out.astype(np.uint8)


def _h264_chroma_block(refC: np.ndarray, cy0: int, cx0: int,
                       mvx: int, mvy: int, bs: int = 8) -> np.ndarray:
    """§8.4.2.2.2 eighth-sample chroma prediction (4:2:0): bilinear
    weights ((8−dx)(8−dy), dx(8−dy), (8−dx)dy, dx·dy)/64 over the four
    surrounding chroma samples; the luma quarter-pel MV value IS the
    chroma eighth-pel value."""
    H, W = refC.shape
    ix, iy = mvx >> 3, mvy >> 3
    dx, dy = mvx & 7, mvy & 7
    rows = np.clip(np.arange(cy0 + iy, cy0 + iy + bs + 1), 0, H - 1)
    cols = np.clip(np.arange(cx0 + ix, cx0 + ix + bs + 1), 0, W - 1)
    win = refC[np.ix_(rows, cols)].astype(np.int64)
    a = win[:bs, :bs]
    bb = win[:bs, 1:bs + 1]
    c = win[1:bs + 1, :bs]
    d = win[1:bs + 1, 1:bs + 1]
    out = ((8 - dx) * (8 - dy) * a + dx * (8 - dy) * bb
           + (8 - dx) * dy * c + dx * dy * d + 32) >> 6
    return out.astype(np.uint8)


def decode_h264_picture(nal: bytes, width: int, height: int,
                        ref_planes=None):
    """Plane-domain picture decode (r11 — the fractional-motion tier):
    one slice NAL → ``((Y, Cb, Cr) padded planes, cropped RGB)``.  I
    slices route to decode_h264_islice_planes; P slices reconstruct
    per-macroblock translational prediction at FULL quarter-pel luma /
    eighth-pel chroma precision (§8.4.2.2: 6-tap half-pel + averaged
    quarter positions on Y, bilinear on Cb/Cr) against ``ref_planes``
    — the previous decoded picture's planes, which the caller chains —
    then add the decoded LUMA residual plane (r11 third wave: CAVLC
    inter residuals under nC < 2 contexts, §8.5.12 dequant + inverse
    core transform) and clip.  Chroma residuals, sub-partitions, nC ≥ 2
    contexts and B prediction remain the documented seam
    (_parse_p_slice_tail raises)."""
    data = _strip_emulation(bytes(nal))
    if not data or (data[0] & 0x1F) not in (1, 5):
        raise ValueError("H264: not a slice NAL")
    nal_ref_idc = (data[0] >> 5) & 3
    r = _EgBitReader(data[1:])
    if r.ue() != 0:
        raise ValueError("H264: multi-slice pictures unsupported")
    stype = r.ue()
    if stype % 5 == 2:
        planes = decode_h264_islice_planes(nal, width, height)
        return planes, _h264_planes_to_rgb(*planes, width, height)
    mvs, res, cres = _parse_p_slice_tail(r, nal_ref_idc, stype,
                                         width, height)
    if ref_planes is None:
        raise ValueError(
            "H264: P slice with no reference picture (the caller "
            "must pass the previous decoded planes)")
    refY, refCb, refCr = ref_planes
    outY = np.empty_like(refY)
    outCb = np.empty_like(refCb)
    outCr = np.empty_like(refCr)
    for (mbx, mby), (mvx, mvy) in mvs.items():
        y0, x0 = 16 * mby, 16 * mbx
        outY[y0:y0 + 16, x0:x0 + 16] = _h264_luma_block(
            refY, y0, x0, mvx, mvy)
        cy0, cx0 = 8 * mby, 8 * mbx
        outCb[cy0:cy0 + 8, cx0:cx0 + 8] = _h264_chroma_block(
            refCb, cy0, cx0, mvx, mvy)
        outCr[cy0:cy0 + 8, cx0:cx0 + 8] = _h264_chroma_block(
            refCr, cy0, cx0, mvx, mvy)
    if res is not None:                 # §8.5: recon = Clip1(pred + res)
        outY = np.clip(outY.astype(np.int64) + res, 0, 255) \
            .astype(np.uint8)
    if cres is not None:
        outCb = np.clip(outCb.astype(np.int64) + cres[0], 0, 255) \
            .astype(np.uint8)
        outCr = np.clip(outCr.astype(np.int64) + cres[1], 0, 255) \
            .astype(np.uint8)
    return (outY, outCb, outCr), _h264_planes_to_rgb(
        outY, outCb, outCr, width, height)


def decode_h264_slice(nal: bytes, width: int, height: int,
                      ref: np.ndarray | None = None) -> np.ndarray:
    """One slice NAL → (height, width, 3) uint8 RGB.  I slices route to
    decode_h264_islice (I_PCM + CAVLC I_16x16); P slices decode
    P_Skip runs AND MOTION-COMPENSATED P_L0_16x16 macroblocks (r11:
    §8.4.1.3 median MV prediction + §8.4.2.2 clamped translational
    prediction at even-pixel precision) against ``ref``, the previous
    decoded picture the caller tracks.  Fractional-sample motion,
    inter residuals, sub-partitions and B prediction raise at the
    exact remaining ffmpeg seam."""
    data = _strip_emulation(bytes(nal))
    if not data or (data[0] & 0x1F) not in (1, 5):
        raise ValueError("H264: not a slice NAL")
    nal_ref_idc = (data[0] >> 5) & 3
    r = _EgBitReader(data[1:])
    if r.ue() != 0:
        raise ValueError("H264: multi-slice pictures unsupported")
    stype = r.ue()
    if stype % 5 == 2:                  # I slice: the intra routes
        return decode_h264_islice(nal, width, height)
    mvs, res, cres = _parse_p_slice_tail(r, nal_ref_idc, stype,
                                         width, height)
    if ref is None:
        raise ValueError(
            "H264: P slice with no reference picture (the caller "
            "must pass the previous decoded frame)")
    if res is not None or cres is not None:
        raise NotImplementedError(
            "H264: inter residuals decode through the PLANE route "
            "(decode_h264_picture) — the RGB route is display-only "
            "for residual-free streams")
    if all(v == (0, 0) for v in mvs.values()):
        return ref.copy()               # zero-motion: exact repeat
    # Motion compensation (§8.4.2.2, reference coordinates clamped to
    # the picture).  The pipeline's pictures are RGB with replication-
    # upsampled 4:2:0 chroma, so an EVEN-pixel luma shift (mv ≡ 0 mod
    # 8 quarter-pel units) shifts luma and chroma coherently and the
    # RGB-domain block copy is bit-exact.  Fractional-sample motion
    # (the 6-tap half-pel filter) and odd-pixel chroma misalignment
    # remain the documented seam; cropped (non-multiple-of-16)
    # pictures would need the padded reference the display path drops.
    if width % 16 or height % 16:
        raise NotImplementedError(
            "H264: motion compensation over cropped pictures needs the "
            "padded reference — encode MC streams at multiple-of-16 "
            "dimensions")
    out = np.empty_like(ref)
    for (mbx, mby), (mvx, mvy) in mvs.items():
        if mvx % 8 or mvy % 8:
            raise NotImplementedError(
                "H264: fractional/odd-pixel motion needs the 6-tap "
                "interpolation filter — the remaining inter seam")
        ys = np.clip(np.arange(16 * mby, 16 * mby + 16) + mvy // 4,
                     0, height - 1)
        xs = np.clip(np.arange(16 * mbx, 16 * mbx + 16) + mvx // 4,
                     0, width - 1)
        out[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
            ref[np.ix_(ys, xs)]
    return out
