"""Minimal BASELINE-SEQUENTIAL JPEG codec, stdlib + numpy only — retires
the last fake decoder in the multimodal path (VERDICT r2 item 9).

Clean-room implementation of the public ITU-T T.81 baseline process:

- encoder: YCbCr (JFIF) color transform, 8×8 orthonormal FDCT, uniform
  quantization, zigzag, DC DPCM + AC run/size symbols, canonical Huffman
  entropy coding with byte stuffing, markers SOI/APP0/DQT/SOF0/DHT/SOS/
  EOI.  Tables are CUSTOM (flat canonical Huffman — every used symbol at
  one code length — and a quality-scaled uniform quant table) and are
  written into the file's DQT/DHT segments, so any conforming baseline
  decoder reads the output; the spec's "standard" Annex-K tables are an
  optimization, not a conformance requirement.
- decoder: reads DQT/DHT from the file (so it also decodes files using
  the standard tables), baseline 8-bit Huffman process only, grayscale
  or 4:4:4 three-component interleave.  Everything outside that subset
  refuses with ValueError — progressive (SOF2), arithmetic coding,
  12-bit precision, subsampled chroma, restart intervals, hierarchical —
  and the multimodal operator's fallback labels the row honestly,
  exactly like core/pdf.py's contract.

Round-trips are LOSSY (DCT rounding); tests bound the error instead of
asserting equality.  Reference analog: the reference treats images as
opaque inputs (no decoding at all); this codec exists so the Spark-side
multimodal plumbing is exercised against real encoded bytes.
"""
from __future__ import annotations

import struct

import numpy as np

# ---- 8-point orthonormal DCT-II -------------------------------------------
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _zigzag_order() -> list[tuple[int, int]]:
    out = []
    for s in range(15):
        rng = range(s + 1) if s % 2 else range(s, -1, -1)
        for i in rng:
            j = s - i
            if i < 8 and j < 8:
                out.append((i, j))
    return out


_ZIG = _zigzag_order()
_ZIG_FLAT = np.array([i * 8 + j for i, j in _ZIG])


def _quant_table(quality: int) -> np.ndarray:
    """Uniform table scaled by quality (1..100): q=100 → all-1 steps
    (near-lossless), q=50 → step 8. Simpler than Annex K and written into
    the file, so decoders need no assumption about it."""
    quality = min(100, max(1, quality))
    step = max(1, round(8 * (101 - quality) / 51))
    return np.full((8, 8), step, dtype=np.int64)


# ---- bit IO -----------------------------------------------------------------
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                raise ValueError("restart markers not supported")
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# ---- canonical Huffman -------------------------------------------------------
def _flat_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(bits, huffval) DHT payload: all symbols at one canonical length L
    with 2^L > nsyms (the all-ones code stays unused, as T.81 requires)."""
    n = len(symbols)
    length = max(1, (n + 1 - 1).bit_length())  # smallest L with 2^L > n
    while (1 << length) <= n:
        length += 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, list(symbols)


def _codes_from_dht(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), canonical generation per T.81 Annex C."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], huffval: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _value_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---- color ------------------------------------------------------------------
def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---- encoder ----------------------------------------------------------------
def encode_jpeg_baseline(img: np.ndarray, quality: int = 95) -> bytes:
    """Grayscale (h, w) or RGB (h, w, 3) uint8 → baseline JPEG bytes."""
    img = np.asarray(img)
    if img.dtype != np.uint8 or img.ndim not in (2, 3) or (img.ndim == 3 and img.shape[2] != 3):
        raise ValueError("expected uint8 (h,w) or (h,w,3)")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., c] for c in range(3)]
    ncomp = len(planes)
    q = _quant_table(quality)

    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    quantized: list[list[np.ndarray]] = []  # per component: blocks in raster order
    for p in planes:
        padded = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge") - 128.0
        blocks = []
        for by in range(0, ph, 8):
            for bx in range(0, pw, 8):
                d = _C @ padded[by : by + 8, bx : bx + 8] @ _C.T
                blocks.append(np.round(d / q).astype(np.int64))
        quantized.append(blocks)

    # gather symbols per table class (luma tables serve component 0; one
    # shared chroma table pair serves components 1-2)
    nclass = 1 if ncomp == 1 else 2
    dc_syms: list[set[int]] = [set() for _ in range(nclass)]
    ac_syms: list[set[int]] = [set() for _ in range(nclass)]

    def _block_symbols(zz: np.ndarray, prev_dc: int, cls: int) -> int:
        dc_syms[cls].add(_category(int(zz[0]) - prev_dc))
        run = 0
        for v in zz[1:]:
            if v == 0:
                run += 1
                continue
            while run > 15:
                ac_syms[cls].add(0xF0)
                run -= 16
            ac_syms[cls].add((run << 4) | _category(int(v)))
            run = 0
        if run:
            ac_syms[cls].add(0x00)
        return int(zz[0])

    prev = [0] * ncomp
    zz_blocks = [[b.flatten()[_ZIG_FLAT] for b in comp] for comp in quantized]
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        for zz in zz_blocks[ci]:
            prev[ci] = _block_symbols(zz, prev[ci], cls)

    dc_tables = [_flat_table(sorted(s) or [0]) for s in dc_syms]
    ac_tables = [_flat_table(sorted(s) or [0]) for s in ac_syms]
    dc_codes = [_codes_from_dht(*t) for t in dc_tables]
    ac_codes = [_codes_from_dht(*t) for t in ac_tables]

    bw = _BitWriter()
    prev = [0] * ncomp
    n_blocks_y = ph // 8
    n_blocks_x = pw // 8
    for mcu in range(n_blocks_y * n_blocks_x):
        for ci in range(ncomp):
            cls = 0 if ci == 0 else 1
            zz = zz_blocks[ci][mcu]
            dc = int(zz[0])
            diff = dc - prev[ci]
            prev[ci] = dc
            size = _category(diff)
            c, ln = dc_codes[cls][size]
            bw.write(c, ln)
            if size:
                bw.write(_value_bits(diff, size), size)
            run = 0
            for v in zz[1:]:
                v = int(v)
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    c, ln = ac_codes[cls][0xF0]
                    bw.write(c, ln)
                    run -= 16
                size = _category(v)
                c, ln = ac_codes[cls][(run << 4) | size]
                bw.write(c, ln)
                bw.write(_value_bits(v, size), size)
                run = 0
            if run:
                c, ln = ac_codes[cls][0x00]
                bw.write(c, ln)
    scan = bw.flush()

    # ---- markers ----
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = q.flatten()[_ZIG_FLAT]
    out += seg(0xDB, bytes([0]) + bytes(int(x) for x in zz_q))
    if nclass == 2:
        out += seg(0xDB, bytes([1]) + bytes(int(x) for x in zz_q))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1×1 sampling
    out += seg(0xC0, sof)
    for cls in range(nclass):
        bits, vals = dc_tables[cls]
        out += seg(0xC4, bytes([0x00 | cls]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tables[cls]
        out += seg(0xC4, bytes([0x10 | cls]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------------
def decode_jpeg_baseline(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (h, w) or (h, w, 3). ValueError on
    anything outside the supported subset (see module docstring)."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    scan_comps = None
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_ZIG_FLAT] = np.frombuffer(payload[p + 1 : p + 65], dtype=np.uint8)
                qtables[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = payload[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError("subsampled chroma not supported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline frame type 0xFF{marker:02X} not supported")
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", payload[:2])
            if ri != 0:
                raise ValueError("restart intervals not supported")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = [(payload[1 + 2 * i], payload[2 + 2 * i]) for i in range(ns)]
            scan_start = pos + seglen
            break
        # APPn / COM / others: skipped
        pos += seglen
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = frame
    if len(scan_comps) != len(comps):
        raise ValueError("scan/frame component mismatch")
    if len(comps) not in (1, 3):
        raise ValueError("only 1 or 3 components supported")

    br = _BitReader(data[scan_start:])
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    nby, nbx = ph // 8, pw // 8
    planes = [np.zeros((ph, pw)) for _ in comps]
    prev = [0] * len(comps)
    tq_of = {cid: tq for cid, tq in comps}
    for mcu in range(nby * nbx):
        by, bx = divmod(mcu, nbx)
        for ci, (cid, tsel) in enumerate(scan_comps):
            td, ta = tsel >> 4, tsel & 0xF
            dc_dec, ac_dec = htables.get((0, td)), htables.get((1, ta))
            if dc_dec is None or ac_dec is None:
                raise ValueError("scan references missing Huffman table")
            q = qtables.get(tq_of.get(cid, 255))
            if q is None:
                raise ValueError("scan references missing quant table")
            zz = np.zeros(64, dtype=np.int64)
            size = dc_dec.decode(br)
            diff = _extend(br.read_bits(size), size) if size else 0
            prev[ci] += diff
            zz[0] = prev[ci]
            k = 1
            while k < 64:
                sym = ac_dec.decode(br)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0xF
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    k += 16
                    continue
                k += run
                if k >= 64:
                    raise ValueError("AC run overflows block")
                zz[k] = _extend(br.read_bits(size), size)
                k += 1
            blk = np.zeros(64, dtype=np.int64)
            blk[_ZIG_FLAT] = zz
            d = blk.reshape(8, 8) * q
            pix = _C.T @ d @ _C + 128.0
            planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = pix
    if len(comps) == 1:
        return np.clip(np.round(planes[0][:h, :w]), 0, 255).astype(np.uint8)
    ycc = np.stack([p[:h, :w] for p in planes], axis=-1)
    return _ycbcr_to_rgb(ycc)
