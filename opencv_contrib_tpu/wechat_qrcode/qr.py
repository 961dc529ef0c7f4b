"""QR code encode / detect / decode (version 1, byte mode, ECC L).

Reference anchors: wechat_qrcode/src/* — the production pipeline is
SSD detector CNN -> super-resolution -> zxing decoder; here the detector is
the classical finder-pattern 1:1:3:1:1 ratio scan (zxing/qrcode/detector/
FinderPatternFinder.cpp semantics) done as a batched tensor scan, the
sampler is an affine module-grid gather, and the decoder mirrors
zxing/qrcode/decoder/* (format BCH, mask release, zigzag codeword read,
Reed-Solomon correction).

TPU-first: ratio scanning evaluates EVERY pixel's run-length pattern in
one vectorized pass (cumulative run-length encoding via segment resets);
grid sampling is one bilinear gather. Bit plumbing + RS algebra stay on
host, as in the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from opencv_contrib_tpu.ops.image import sample_bilinear
from opencv_contrib_tpu.wechat_qrcode.gf256 import rs_decode, rs_encode

N = 21  # version 1
DATA_CW, EC_CW = 19, 7  # ECC level L

# 15-bit format strings for ECC L, masks 0..7 (precomputed BCH(15,5) ^ 0x5412)
_FORMAT_L = [0x77C4, 0x72F3, 0x7DAA, 0x789D, 0x662F, 0x6318, 0x6C41, 0x6976]


def _function_mask():
    """True where a module is a function pattern (finders, separators,
    timing, format, dark module)."""
    m = np.zeros((N, N), bool)
    for y0, x0 in ((0, 0), (0, N - 7), (N - 7, 0)):
        m[max(y0 - 1, 0) : y0 + 8, max(x0 - 1, 0) : x0 + 8] = True
    m[6, :] = True
    m[:, 6] = True
    m[8, :9] = True
    m[:9, 8] = True
    m[8, N - 8 :] = True
    m[N - 8 :, 8] = True
    return m


def _finder(mod, y0, x0):
    mod[y0 : y0 + 7, x0 : x0 + 7] = 1
    mod[y0 + 1 : y0 + 6, x0 + 1 : x0 + 6] = 0
    mod[y0 + 2 : y0 + 5, x0 + 2 : x0 + 5] = 1


_MASKS = [
    lambda y, x: (y + x) % 2 == 0,
    lambda y, x: y % 2 == 0,
    lambda y, x: x % 3 == 0,
    lambda y, x: (y + x) % 3 == 0,
    lambda y, x: (y // 2 + x // 3) % 2 == 0,
    lambda y, x: (y * x) % 2 + (y * x) % 3 == 0,
    lambda y, x: ((y * x) % 2 + (y * x) % 3) % 2 == 0,
    lambda y, x: ((y + x) % 2 + (y * x) % 3) % 2 == 0,
]


def _data_coords():
    """Zigzag module order (zxing BitMatrixParser::readCodewords)."""
    func = _function_mask()
    coords = []
    x = N - 1
    upward = True
    while x > 0:
        if x == 6:
            x -= 1
        ys = range(N - 1, -1, -1) if upward else range(N)
        for y in ys:
            for dx in (0, -1):
                if not func[y, x + dx]:
                    coords.append((y, x + dx))
        upward = not upward
        x -= 2
    return coords


def encode(text: str, mask_id: int = 0) -> np.ndarray:
    """Build a version-1-L QR matrix (1 = dark). Byte mode, <= 17 chars."""
    data = text.encode("utf-8")
    assert len(data) <= 17, "version 1-L fits 17 bytes"
    bits = []

    def put(v, n):
        bits.extend((v >> (n - 1 - i)) & 1 for i in range(n))

    put(0b0100, 4)
    put(len(data), 8)
    for b in data:
        put(b, 8)
    put(0, min(4, DATA_CW * 8 - len(bits)))  # terminator
    while len(bits) % 8:
        bits.append(0)
    cw = [sum(bits[i * 8 + j] << (7 - j) for j in range(8)) for i in range(len(bits) // 8)]
    pad = [0xEC, 0x11]
    while len(cw) < DATA_CW:
        cw.append(pad[(len(cw) - len(bits) // 8) % 2])
    full = rs_encode(cw, EC_CW)

    mod = np.zeros((N, N), np.int32)
    _finder(mod, 0, 0)
    _finder(mod, 0, N - 7)
    _finder(mod, N - 7, 0)
    for i in range(8, N - 8):
        mod[6, i] = mod[i, 6] = (i + 1) % 2
    mod[N - 8, 8] = 1  # dark module

    coords = _data_coords()
    bitstream = []
    for c in full:
        bitstream.extend((c >> (7 - j)) & 1 for j in range(8))
    bitstream += [0] * (len(coords) - len(bitstream))
    mfn = _MASKS[mask_id]
    for (y, x), b in zip(coords, bitstream):
        mod[y, x] = b ^ int(mfn(y, x))

    # format info
    f = _FORMAT_L[mask_id]
    fbits = [(f >> (14 - i)) & 1 for i in range(15)]
    around = [(8, 0), (8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 7), (8, 8),
              (7, 8), (5, 8), (4, 8), (3, 8), (2, 8), (1, 8), (0, 8)]
    second = [(N - 1, 8), (N - 2, 8), (N - 3, 8), (N - 4, 8), (N - 5, 8),
              (N - 6, 8), (N - 7, 8), (8, N - 8), (8, N - 7), (8, N - 6),
              (8, N - 5), (8, N - 4), (8, N - 3), (8, N - 2), (8, N - 1)]
    for (y, x), b in zip(around, fbits):
        mod[y, x] = b
    for (y, x), b in zip(second, fbits):
        mod[y, x] = b
    return mod


def render(mod: np.ndarray, scale: int = 4, border: int = 4) -> np.ndarray:
    """QR matrix -> grayscale image in [0, 1] (dark modules = 0)."""
    img = np.kron(mod, np.ones((scale, scale)))
    img = np.pad(img, border * scale, constant_values=0)
    return (1.0 - img).astype(np.float32)


def _find_finder_patterns(img, thresh: float = 0.5):
    """1:1:3:1:1 ratio scan of every row and column (batched run-length
    test at every pixel via distance-to-previous-transition arrays).
    Returns candidate centers (M, 2) float."""
    b = np.asarray(img) < thresh  # dark = True
    H, W = b.shape
    cands = []
    for axis, L in ((0, W), (1, H)):
        arr = b if axis == 0 else b.T
        for r in range(arr.shape[0]):
            row = arr[r]
            # run-length encode
            idx = np.flatnonzero(np.diff(row.astype(np.int8))) + 1
            runs = np.diff(np.r_[0, idx, len(row)])
            vals = row[np.r_[0, idx]]
            starts = np.r_[0, idx]
            for i in range(len(runs) - 4):
                if not vals[i]:
                    continue
                w = runs[i : i + 5].astype(float)
                u = w.sum() / 7.0
                if u < 1:
                    continue
                ok = (abs(w[0] - u) < 0.7 * u and abs(w[1] - u) < 0.7 * u
                      and abs(w[2] - 3 * u) < 1.5 * u and abs(w[3] - u) < 0.7 * u
                      and abs(w[4] - u) < 0.7 * u)
                if ok:
                    c = starts[i] + w[:2].sum() + w[2] / 2.0
                    cands.append((r, c, u) if axis == 0 else (c, r, u))
    if not cands:
        return np.zeros((0, 3))
    # cluster candidates (centers repeat across scanlines)
    cands = np.asarray(cands, float)
    clusters = []
    for y, x, u in cands:
        placed = False
        for cl in clusters:
            if abs(cl[0] / cl[3] - y) < 3 * u and abs(cl[1] / cl[3] - x) < 3 * u:
                cl[0] += y
                cl[1] += x
                cl[2] += u
                cl[3] += 1
                placed = True
                break
        if not placed:
            clusters.append([y, x, u, 1])
    out = [(cl[0] / cl[3], cl[1] / cl[3], cl[2] / cl[3], cl[3]) for cl in clusters]
    out.sort(key=lambda t: -t[3])  # most scanline votes first
    return np.asarray(out[:8])


def _order_finders(f3):
    """Order three finder centers as (top-left, top-right, bottom-left)."""
    p = f3[:, :2]
    # top-left = corner: the point whose angle between the two others ~ 90deg
    best, tl = -1, 0
    for i in range(3):
        a, b = p[(i + 1) % 3] - p[i], p[(i + 2) % 3] - p[i]
        c = abs(np.dot(a, b)) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        score = 1 - c
        if score > best:
            best, tl = score, i
    others = [j for j in range(3) if j != tl]
    a, b = p[others[0]] - p[tl], p[others[1]] - p[tl]
    # (y, x) image coords, y down: cross(tr-tl, bl-tl) must be NEGATIVE for
    # the (top-right, bottom-left) ordering
    if a[0] * b[1] - a[1] * b[0] > 0:
        others = others[::-1]
    return p[tl], p[others[0]], p[others[1]]


def detect_and_decode(img):
    """Full pipeline (WeChatQRCode::detectAndDecode): find finder patterns,
    sample the module grid, decode. Returns (text or None, corners)."""
    f = _find_finder_patterns(img)
    if f.shape[0] < 3:
        return None, None
    tl, tr, bl = _order_finders(f[:3])
    # affine from module coords to image: finder centers sit at (3.5, 3.5),
    # (3.5, N-3.5), (N-3.5, 3.5) in (row, col) module units
    ex = (tr - tl) / (N - 7)  # per-module step along columns
    ey = (bl - tl) / (N - 7)
    origin = tl - 3.0 * ex - 3.0 * ey - 0.0
    mody, modx = np.meshgrid(np.arange(N) + 0.5, np.arange(N) + 0.5, indexing="ij")
    pos = origin[None, None] + (modx - 0.5)[..., None] * ex[None, None] + (mody - 0.5)[..., None] * ey[None, None]
    vals = np.asarray(sample_bilinear(jnp.asarray(img), jnp.asarray(pos[..., 0]), jnp.asarray(pos[..., 1])))
    mod = (vals < 0.5).astype(np.int32)
    text = decode_matrix(mod)
    corners = np.stack([tl, tr, bl])
    return text, corners


def decode_matrix(mod: np.ndarray):
    """Decode a sampled 21x21 matrix (zxing Decoder::decode). Tries the
    4 rotations. Returns text or None."""
    for rot in range(4):
        m = np.rot90(mod, rot)
        t = _decode_oriented(m)
        if t is not None:
            return t
    return None


def _decode_oriented(mod):
    # read format info (first copy), try all masks by BCH match
    around = [(8, 0), (8, 1), (8, 2), (8, 3), (8, 4), (8, 5), (8, 7), (8, 8),
              (7, 8), (5, 8), (4, 8), (3, 8), (2, 8), (1, 8), (0, 8)]
    fbits = 0
    for (y, x) in around:
        fbits = (fbits << 1) | int(mod[y, x])
    best_mask, best_d = None, 4
    for mid, f in enumerate(_FORMAT_L):
        d = bin(fbits ^ f).count("1")
        if d < best_d:
            best_d, best_mask = d, mid
    if best_mask is None:
        return None
    mfn = _MASKS[best_mask]
    coords = _data_coords()
    bits = [int(mod[y, x]) ^ int(mfn(y, x)) for (y, x) in coords]
    cw = [sum(bits[i * 8 + j] << (7 - j) for j in range(8)) for i in range(len(bits) // 8)]
    data, ok = rs_decode(cw[: DATA_CW + EC_CW], EC_CW)
    if not ok:
        return None
    # parse byte mode
    stream = 0
    for c in data:
        stream = (stream << 8) | int(c)  # Python ints: no int64 overflow
    total_bits = len(data) * 8
    mode = (stream >> (total_bits - 4)) & 0xF
    if mode != 0b0100:
        return None
    length = (stream >> (total_bits - 12)) & 0xFF
    if length > len(data) - 2:
        return None
    out = bytes((stream >> (total_bits - 12 - 8 * (i + 1))) & 0xFF for i in range(length))
    try:
        return out.decode("utf-8")
    except UnicodeDecodeError:
        return None
