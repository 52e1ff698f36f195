"""Baseline JPEG (ITU T.81 sequential DCT, JFIF) encoder + verifying
decoder — numpy + stdlib only, no codec libraries.

Closes the LAST format row of SURVEY §2.1 S6 (the reference serves
graphviz raster images, ProvController.java:69; this container ships no
image libs, so the codec is implemented from the format spec).

Design choices, all spec-valid and chosen for verifiability:
- 4:4:4 (no chroma subsampling), one 8x8 block grid per component;
- quantization tables generated from a `quality` knob (declared in DQT
  — any table is legal; a generated ramp keeps the codec free of
  transcribed spec constants);
- HUFFMAN TABLES ARE BUILT FROM THE IMAGE and declared in DHT: every
  symbol the scan actually emits gets one canonical code of a single
  length L with n_symbols < 2^L (prefix-free by construction, the
  all-ones code never assigned). Self-describing streams mean the
  decoder — and any external baseline decoder — reads the tables from
  the file, so the round-trip test never depends on constants that
  could be wrong the same way twice;
- the DCT is the exact orthonormal matrix transform (C @ block @ C.T),
  so encode∘decode error comes only from quantization — the PSNR bound
  in the tests is a real claim about the codec, not the test.

The 2000-era spec structure (marker segments, byte stuffing, DC
prediction, zigzag, run/size AC coding, EOB/ZRL) is implemented in
full for the baseline feature set above.
"""
from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c[0, :] = 1.0
    scale = np.full((8, 1), np.sqrt(2.0 / 8.0))
    scale[0, 0] = np.sqrt(1.0 / 8.0)
    return c * scale


_C = _dct_matrix()


def quant_table(quality: int, chroma: bool) -> np.ndarray:
    """Generated ramp table: coarser with frequency, coarser for chroma,
    scaled by the usual libjpeg-style quality mapping. Declared in DQT,
    so any compliant decoder applies exactly this."""
    u = np.arange(8)
    base = 8.0 + (u[None, :] + u[:, None]) * (3.0 if not chroma else 5.0)
    q = max(1, min(100, quality))
    scale = 5000.0 / q if q < 50 else 200.0 - 2.0 * q
    t = np.floor((base * scale + 50.0) / 100.0)
    return np.clip(t, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255) \
        .round().astype(np.uint8)


def _blocks(chan: np.ndarray) -> np.ndarray:
    h, w = chan.shape
    hh, ww = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(chan, ((0, hh - h), (0, ww - w)), mode="edge")
    return (padded.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _size_of(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:            # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec
        return bytes(self.out)


def _huff_spec(symbols: set[int]) -> tuple[list[int], list[int], dict]:
    """Single-length canonical table over the used symbols: length L with
    n < 2^L (the all-ones code stays unassigned). Returns (BITS[1..16],
    HUFFVAL, symbol → (code, L))."""
    vals = sorted(symbols) or [0]
    L = max(1, (len(vals)).bit_length())    # n < 2^bit_length(n) always
    assert len(vals) < (1 << L)             # ⇒ all-ones code unassigned
    bits = [0] * 16
    bits[L - 1] = len(vals)
    codes = {v: (i, L) for i, v in enumerate(vals)}
    return bits, vals, codes


def _encode_channel_symbols(qblocks: np.ndarray):
    """Per block: (dc_size, dc_diffbits), [(rs, acbits), ...] with DC
    prediction + run/size AC coding; also the used symbol sets."""
    dc_syms, ac_syms, blocks_out = set(), set(), []
    pred = 0
    for blk in qblocks:
        zz = blk.flatten()[ZIGZAG]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        s = _size_of(diff)
        dc_syms.add(s)
        dbits = diff if diff >= 0 else diff + (1 << s) - 1
        acs = []
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        last = (last_nz[-1] + 1) if len(last_nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                if run == 16:
                    acs.append((0xF0, 0, 0))      # ZRL
                    ac_syms.add(0xF0)
                    run = 0
                continue
            sz = _size_of(v)
            rs = (run << 4) | sz
            vb = v if v >= 0 else v + (1 << sz) - 1
            acs.append((rs, vb, sz))
            ac_syms.add(rs)
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))              # EOB
            ac_syms.add(0x00)
        blocks_out.append(((s, dbits), acs))
    return blocks_out, dc_syms, ac_syms


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def jpeg_encode(rgb: np.ndarray, quality: int = 85) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes. Deterministic."""
    h, w = rgb.shape[:2]
    ycc = _rgb_to_ycbcr(rgb)
    qt = [quant_table(quality, False), quant_table(quality, True)]
    chans = []
    for ci in range(3):
        tq = qt[0 if ci == 0 else 1].astype(np.float64)
        blks = _blocks(ycc[..., ci]) - 128.0
        coef = np.einsum("ux,nxy,vy->nuv", _C, blks, _C)
        qb = np.round(coef / tq).astype(np.int64)
        chans.append(_encode_channel_symbols(qb))
    # two table classes shared across: DC (0: luma, 1: chroma), AC same
    dc_tabs, ac_tabs = [], []
    for ids in ([0], [1, 2]):
        dsy, asy = set(), set()
        for i in ids:
            dsy |= chans[i][1]
            asy |= chans[i][2]
        dc_tabs.append(_huff_spec(dsy))
        ac_tabs.append(_huff_spec(asy))

    bw = _BitWriter()
    n_blocks = len(chans[0][0])
    for bi in range(n_blocks):          # interleaved MCU = 1 block each
        for ci in range(3):
            t = 0 if ci == 0 else 1
            (s, dbits), acs = chans[ci][0][bi]
            code, ln = dc_tabs[t][2][s]
            bw.write(code, ln)
            bw.write(dbits, s)
            for rs, vb, sz in acs:
                code, ln = ac_tabs[t][2][rs]
                bw.write(code, ln)
                bw.write(vb, sz)
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")                      # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, t in enumerate(qt):
        zz = t.flatten()[ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xFFDB, bytes([tid]) + zz)
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 3)
                + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for tid, (bits, vals, _) in enumerate(tabs):
            out += _seg(0xFFC4, bytes([(cls << 4) | tid])
                        + bytes(bits) + bytes(vals))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    out += scan
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder (verification half)
# ---------------------------------------------------------------------------

class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.i = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            b = self.data[self.i]
            self.i += 1
            if b == 0xFF:               # unstuff
                assert self.data[self.i] == 0x00, "marker inside scan"
                self.i += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v


def _huff_lookup(bits: list[int], vals: list[int]) -> dict:
    """(length, code) → symbol, canonical order per spec."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_huff(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.read(1)
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    assert data[:2] == b"\xff\xd8"
    i = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    h = w = None
    comp_q: list[int] = []
    scan_tabs: list[tuple[int, int]] = []
    while i < len(data):
        assert data[i] == 0xFF
        marker = data[i + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", data[i + 2:i + 4])
        seg = data[i + 4:i + 2 + ln]
        if marker == 0xDB:
            tid = seg[0] & 0x0F
            t = np.zeros(64, dtype=np.int32)
            t[ZIGZAG] = np.frombuffer(seg[1:65], dtype=np.uint8)
            qts[tid] = t.reshape(8, 8)
        elif marker == 0xC0:
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            assert nc == 3
            comp_q = [seg[6 + 3 * c + 2] for c in range(3)]
            for c in range(3):
                assert seg[6 + 3 * c + 1] == 0x11, "4:4:4 only"
        elif marker == 0xC4:
            off = 0
            while off < len(seg):
                cls_id = seg[off]
                bits = list(seg[off + 1:off + 17])
                n = sum(bits)
                vals = list(seg[off + 17:off + 17 + n])
                huff[(cls_id >> 4, cls_id & 0x0F)] = _huff_lookup(bits, vals)
                off += 17 + n
        elif marker == 0xDA:
            ns = seg[0]
            scan_tabs = [(seg[1 + 2 * c + 1] >> 4, seg[1 + 2 * c + 1] & 0x0F)
                         for c in range(ns)]
            i = i + 2 + ln
            break
        i += 2 + ln
    assert h is not None and scan_tabs
    br = _BitReader(data[i:])
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    planes = [np.zeros((bh * 8, bw_ * 8)) for _ in range(3)]
    preds = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(3):
                dt = huff[(0, scan_tabs[ci][0])]
                at = huff[(1, scan_tabs[ci][1])]
                s = _read_huff(br, dt)
                diff = _extend(br.read(s), s) if s else 0
                preds[ci] += diff
                zz = np.zeros(64, dtype=np.int64)
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    rs = _read_huff(br, at)
                    if rs == 0x00:
                        break
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += rs >> 4
                    sz = rs & 0x0F
                    zz[k] = _extend(br.read(sz), sz)
                    k += 1
                blk = np.zeros(64, dtype=np.float64)
                blk[ZIGZAG] = zz
                deq = blk.reshape(8, 8) * qts[comp_q[ci]]
                pix = _C.T @ deq @ _C + 128.0
                planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = pix
    ycc = np.stack([p[:h, :w] for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
