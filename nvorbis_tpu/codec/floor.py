"""Vorbis floor decoding: Floor1 (piecewise-linear, the one in real use) and
Floor0 (LSP, legacy).

References: NVorbis/Floor1.cs (setup 30-133, post unpack 135-184, post unwrap
224-297, closed-form of the integer Bresenham render 316-341, inverse dB
table 345-410) and NVorbis/Floor0.cs.

The render here uses the closed form of the reference's Bresenham walk:
``y(x0+t) = y0 + sign(dy) * floor(t*|dy| / adx)`` with
``adx = min(x1, n) - x0`` (the reference clips x1 but not y1, which changes
the slope of the final segment when it crosses n; we reproduce that).
"""

import numpy as np

from nvorbis_tpu.errors import InvalidDataError
from nvorbis_tpu.utils.bitmath import ilog

# inverse_dB_table, 256 entries (NVorbis/Floor1.cs:345-410; Vorbis I spec)
INVERSE_DB_TABLE = np.array([
    1.0649863e-07, 1.1341951e-07, 1.2079015e-07, 1.2863978e-07,
    1.3699951e-07, 1.4590251e-07, 1.5538408e-07, 1.6548181e-07,
    1.7623575e-07, 1.8768855e-07, 1.9988561e-07, 2.1287530e-07,
    2.2670913e-07, 2.4144197e-07, 2.5713223e-07, 2.7384213e-07,
    2.9163793e-07, 3.1059021e-07, 3.3077411e-07, 3.5226968e-07,
    3.7516214e-07, 3.9954229e-07, 4.2550680e-07, 4.5315863e-07,
    4.8260743e-07, 5.1396998e-07, 5.4737065e-07, 5.8294187e-07,
    6.2082472e-07, 6.6116941e-07, 7.0413592e-07, 7.4989464e-07,
    7.9862701e-07, 8.5052630e-07, 9.0579828e-07, 9.6466216e-07,
    1.0273513e-06, 1.0941144e-06, 1.1652161e-06, 1.2409384e-06,
    1.3215816e-06, 1.4074654e-06, 1.4989305e-06, 1.5963394e-06,
    1.7000785e-06, 1.8105592e-06, 1.9282195e-06, 2.0535261e-06,
    2.1869758e-06, 2.3290978e-06, 2.4804557e-06, 2.6416497e-06,
    2.8133190e-06, 2.9961443e-06, 3.1908506e-06, 3.3982101e-06,
    3.6190449e-06, 3.8542308e-06, 4.1047004e-06, 4.3714470e-06,
    4.6555282e-06, 4.9580707e-06, 5.2802740e-06, 5.6234160e-06,
    5.9888572e-06, 6.3780469e-06, 6.7925283e-06, 7.2339451e-06,
    7.7040476e-06, 8.2047000e-06, 8.7378876e-06, 9.3057248e-06,
    9.9104632e-06, 1.0554501e-05, 1.1240392e-05, 1.1970856e-05,
    1.2748789e-05, 1.3577278e-05, 1.4459606e-05, 1.5399272e-05,
    1.6400004e-05, 1.7465768e-05, 1.8600792e-05, 1.9809576e-05,
    2.1096914e-05, 2.2467911e-05, 2.3928002e-05, 2.5482978e-05,
    2.7139006e-05, 2.8902651e-05, 3.0780908e-05, 3.2781225e-05,
    3.4911534e-05, 3.7180282e-05, 3.9596466e-05, 4.2169667e-05,
    4.4910090e-05, 4.7828601e-05, 5.0936773e-05, 5.4246931e-05,
    5.7772202e-05, 6.1526565e-05, 6.5524908e-05, 6.9783085e-05,
    7.4317983e-05, 7.9147585e-05, 8.4291040e-05, 8.9768747e-05,
    9.5602426e-05, 0.00010181521, 0.00010843174, 0.00011547824,
    0.00012298267, 0.00013097477, 0.00013948625, 0.00014855085,
    0.00015820453, 0.00016848555, 0.00017943469, 0.00019109536,
    0.00020351382, 0.00021673929, 0.00023082423, 0.00024582449,
    0.00026179955, 0.00027881276, 0.00029693158, 0.00031622787,
    0.00033677814, 0.00035866388, 0.00038197188, 0.00040679456,
    0.00043323036, 0.00046138411, 0.00049136745, 0.00052329927,
    0.00055730621, 0.00059352311, 0.00063209358, 0.00067317058,
    0.00071691700, 0.00076350630, 0.00081312324, 0.00086596457,
    0.00092223983, 0.00098217216, 0.0010459992,  0.0011139742,
    0.0011863665,  0.0012634633,  0.0013455702,  0.0014330129,
    0.0015261382,  0.0016253153,  0.0017309374,  0.0018434235,
    0.0019632195,  0.0020908006,  0.0022266726,  0.0023713743,
    0.0025254795,  0.0026895994,  0.0028643847,  0.0030505286,
    0.0032487691,  0.0034598925,  0.0036847358,  0.0039241906,
    0.0041792066,  0.0044507950,  0.0047400328,  0.0050480668,
    0.0053761186,  0.0057254891,  0.0060975636,  0.0064938176,
    0.0069158225,  0.0073652516,  0.0078438871,  0.0083536271,
    0.0088964928,  0.009474637,   0.010090352,   0.010746080,
    0.011444421,   0.012188144,   0.012980198,   0.013823725,
    0.014722068,   0.015678791,   0.016697687,   0.017782797,
    0.018938423,   0.020169149,   0.021479854,   0.022875735,
    0.024362330,   0.025945531,   0.027631618,   0.029427276,
    0.031339626,   0.033376252,   0.035545228,   0.037855157,
    0.040315199,   0.042935108,   0.045725273,   0.048696758,
    0.051861348,   0.055231591,   0.058820850,   0.062643361,
    0.066714279,   0.071049749,   0.075666962,   0.080584227,
    0.085821044,   0.091398179,   0.097337747,   0.10366330,
    0.11039993,    0.11757434,    0.12521498,    0.13335215,
    0.14201813,    0.15124727,    0.16107617,    0.17154380,
    0.18269168,    0.19456402,    0.20720788,    0.22067342,
    0.23501402,    0.25028656,    0.26655159,    0.28387361,
    0.30232132,    0.32196786,    0.34289114,    0.36517414,
    0.38890521,    0.41417847,    0.44109412,    0.46975890,
    0.50028648,    0.53279791,    0.56742212,    0.60429640,
    0.64356699,    0.68538959,    0.72993007,    0.77736504,
    0.82788260,    0.88168307,    0.9389798,     1.0,
], dtype=np.float32)

_RANGE_LOOKUP = (256, 128, 86, 64)
_YBITS_LOOKUP = (8, 7, 7, 6)


class Floor1Data:
    """Per-channel unpacked floor: multiplied Y values in sorted-X order."""

    __slots__ = ("has_floor", "ys_sorted", "used_sorted")

    def __init__(self, has_floor, ys_sorted=None, used_sorted=None):
        self.has_floor = has_floor
        self.ys_sorted = ys_sorted      # np.int32 [P], already * multiplier
        self.used_sorted = used_sorted  # np.bool_ [P]


class Floor1:
    floor_type = 1

    def __init__(self, packet, channels, block0_size, block1_size, codebooks):
        # -- partition classes (Floor1.cs:30-67)
        partition_class = [packet.read_bits(4) for _ in range(packet.read_bits(5))]
        maximum_class = (max(partition_class) if partition_class else -1) + 1
        class_dims = [0] * maximum_class
        class_subclasses = [0] * maximum_class
        masterbooks = [None] * maximum_class
        subclass_books = [None] * maximum_class
        for i in range(maximum_class):
            class_dims[i] = packet.read_bits(3) + 1
            class_subclasses[i] = packet.read_bits(2)
            if class_subclasses[i] > 0:
                masterbooks[i] = codebooks[packet.read_bits(8)]
            books = []
            for _ in range(1 << class_subclasses[i]):
                num = packet.read_bits(8) - 1
                books.append(codebooks[num] if num >= 0 else None)
            subclass_books[i] = books

        self.partition_class = partition_class
        self.class_dims = class_dims
        self.class_subclasses = class_subclasses
        self.masterbooks = masterbooks
        self.subclass_books = subclass_books

        multiplier = packet.read_bits(2)
        self.range = _RANGE_LOOKUP[multiplier]
        self.y_bits = _YBITS_LOOKUP[multiplier]
        self.multiplier = multiplier + 1

        range_bits = packet.read_bits(4)
        x_list = [0, 1 << range_bits]
        for cls in partition_class:
            for _ in range(class_dims[cls]):
                x_list.append(packet.read_bits(range_bits))
        if len(set(x_list)) != len(x_list):
            raise InvalidDataError("Floor 1 X values must be unique")
        self.x_list = x_list
        self.post_count = len(x_list)

        # low/high neighbors for post prediction (Floor1.cs:92-115)
        lneigh = [0] * len(x_list)
        hneigh = [0] * len(x_list)
        for i in range(2, len(x_list)):
            lneigh[i] = 0
            hneigh[i] = 1
            for j in range(2, i):
                if x_list[j] < x_list[i]:
                    if x_list[j] > x_list[lneigh[i]]:
                        lneigh[i] = j
                else:
                    if x_list[j] < x_list[hneigh[i]]:
                        hneigh[i] = j
        self.l_neigh = lneigh
        self.h_neigh = hneigh
        self.sort_idx = sorted(range(len(x_list)), key=lambda i: x_list[i])
        self.xs_sorted = np.array([x_list[i] for i in self.sort_idx], dtype=np.int32)

    # -- per-packet unpack (Floor1.cs:135-184) -------------------------------

    def unpack(self, packet, block_size, channel):
        if not packet.read_bit():
            return Floor1Data(False)
        posts = [0] * self.post_count
        posts[0] = packet.read_bits(self.y_bits)
        posts[1] = packet.read_bits(self.y_bits)
        post_count = 2
        bailed = False
        for cls in self.partition_class:
            cdim = self.class_dims[cls]
            cbits = self.class_subclasses[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits > 0:
                cval = self.masterbooks[cls].decode_scalar(packet)
                if cval == -1:
                    bailed = True
                    break
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                if book is not None:
                    val = book.decode_scalar(packet)
                    if val == -1:
                        bailed = True
                        break
                    posts[post_count] = val
                post_count += 1
            if bailed:
                break
        if bailed:
            return Floor1Data(False)
        ys, used = self._unwrap_posts(posts)
        return Floor1Data(True, ys, used)

    def _unwrap_posts(self, posts):
        """Resolve predicted posts into final Y values + used flags, returned
        in sorted-X order and pre-multiplied.  Reference: Floor1.UnwrapPosts
        (224-297) + the *_multiplier scaling in Apply (197-205)."""
        count = self.post_count
        final_y = [0] * count
        used = [False] * count
        final_y[0] = posts[0]
        final_y[1] = posts[1]
        used[0] = used[1] = True
        x_list = self.x_list
        rng = self.range
        for i in range(2, count):
            lo = self.l_neigh[i]
            hi = self.h_neigh[i]
            predicted = _render_point(
                x_list[lo], final_y[lo], x_list[hi], final_y[hi], x_list[i]
            )
            val = posts[i]
            high_room = rng - predicted
            low_room = predicted
            room = 2 * (high_room if high_room < low_room else low_room)
            if val != 0:
                used[lo] = True
                used[hi] = True
                used[i] = True
                if val >= room:
                    if high_room > low_room:
                        final_y[i] = val - low_room + predicted
                    else:
                        final_y[i] = predicted - val + high_room - 1
                else:
                    if val % 2 == 1:
                        final_y[i] = predicted - (val + 1) // 2
                    else:
                        final_y[i] = predicted + val // 2
            else:
                used[i] = False
                final_y[i] = predicted
        mult = self.multiplier
        ys_sorted = np.array(
            [final_y[i] * mult for i in self.sort_idx], dtype=np.int32
        )
        used_sorted = np.array([used[i] for i in self.sort_idx], dtype=np.bool_)
        return ys_sorted, used_sorted

    # -- curve synthesis (host/oracle path) ------------------------------------

    def curve(self, data: Floor1Data, block_size: int) -> np.ndarray:
        """Render the floor curve over [0, block_size/2) as float32 gains."""
        n2 = block_size // 2
        if not data.has_floor:
            return np.zeros(n2, dtype=np.float32)
        ys = render_polyline(self.xs_sorted, data.ys_sorted, data.used_sorted, n2)
        return INVERSE_DB_TABLE[np.clip(ys, 0, 255)]


def _render_point(x0, y0, x1, y1, x):
    # Reference: Floor1.RenderPoint (299-314)
    dy = y1 - y0
    adx = x1 - x0
    off = (abs(dy) * (x - x0)) // adx
    return y0 - off if dy < 0 else y0 + off


def render_polyline_batch(xs_sorted, ys_rows, used_rows, n2):
    """:func:`render_polyline` over a batch of rows sharing one X list.

    ``ys_rows``/``used_rows``: ``[R, P]``.  Returns ``[R, n2]`` int64.
    Semantically identical to R scalar calls (same closed form, same
    clip-at-n2 slope quirk); one call replaces the per-(frame, channel)
    python loop in the host ramp synthesis, which dominated seek cost."""
    xs = np.asarray(xs_sorted, dtype=np.int64)
    ys = np.asarray(ys_rows, dtype=np.int64)
    used = np.asarray(used_rows, dtype=bool)
    R, p = ys.shape
    idx = np.arange(p)

    left_used = np.maximum.accumulate(np.where(used, idx, -1), axis=1)
    right_used = np.minimum.accumulate(
        np.where(used, idx, p)[:, ::-1], axis=1
    )[:, ::-1]

    bins = np.arange(n2, dtype=np.int64)
    interval = np.searchsorted(xs, bins, side="right") - 1  # shared X list
    interval = np.clip(interval, 0, p - 1)
    rowb = np.arange(R)[:, None]
    left = left_used[rowb, interval]
    nxt = np.minimum(interval + 1, p - 1)
    right = np.where(interval + 1 < p, right_used[rowb, nxt], p)

    lx = xs[left]
    ly = ys[rowb, left]
    has_right = right < p
    r_safe = np.where(has_right, right, 0)
    hx = xs[r_safe]
    hy = ys[rowb, r_safe]
    dy = hy - ly
    adx = np.minimum(hx, n2) - lx
    adx_safe = np.where(adx > 0, adx, 1)
    t = bins[None, :] - lx
    off = (t * np.abs(dy)) // adx_safe
    y = ly + np.where(dy < 0, -off, off)
    y = np.where(has_right & (adx > 0), y, ly)
    return y


def render_polyline(xs_sorted, ys_sorted, used_sorted, n2):
    """Vectorized closed form of the reference's Bresenham segment render.

    For each bin x in [0, n2): find the enclosing pair of *used* posts
    (lx,ly)-(hx,hy) and evaluate y = ly + sign(dy)*floor(t*|dy|/adx) with
    adx = min(hx, n2) - lx; bins beyond the last used post hold the last y.
    Matches Floor1.Apply + RenderLineMulti (186-222, 316-341) exactly,
    including the slope change when a segment is clipped at n2.
    """
    xs = np.asarray(xs_sorted, dtype=np.int64)
    ys = np.asarray(ys_sorted, dtype=np.int64)
    used = np.asarray(used_sorted, dtype=bool)
    p = len(xs)
    idx = np.arange(p)

    left_used = np.maximum.accumulate(np.where(used, idx, -1))
    right_used = np.minimum.accumulate(np.where(used, idx, p)[::-1])[::-1]

    bins = np.arange(n2, dtype=np.int64)
    # interval i: xs[i] <= x < xs[i+1]
    interval = np.searchsorted(xs, bins, side="right") - 1
    interval = np.clip(interval, 0, p - 1)
    left = left_used[interval]
    # first used post strictly after the interval
    right = np.where(interval + 1 < p, right_used[np.minimum(interval + 1, p - 1)], p)

    lx = xs[left]
    ly = ys[left]
    has_right = right < p
    r_safe = np.where(has_right, right, 0)
    hx = xs[r_safe]
    hy = ys[r_safe]
    dy = hy - ly
    adx = np.minimum(hx, n2) - lx
    adx_safe = np.where(adx > 0, adx, 1)
    t = bins - lx
    off = (t * np.abs(dy)) // adx_safe
    y = ly + np.where(dy < 0, -off, off)
    y = np.where(has_right & (adx > 0), y, ly)
    return y.astype(np.int64)


class Floor0Data:
    __slots__ = ("has_floor", "amp", "coeffs")

    def __init__(self, has_floor, amp=0.0, coeffs=None):
        self.has_floor = has_floor
        self.amp = amp
        self.coeffs = coeffs


class Floor0:
    """LSP floor on the Bark scale — legacy, rarely used.

    Reference: NVorbis/Floor0.cs.
    """

    floor_type = 0

    def __init__(self, packet, channels, block0_size, block1_size, codebooks):
        self.order = packet.read_bits(8)
        self.rate = packet.read_bits(16)
        self.bark_map_size = packet.read_bits(16)
        self.amp_bits = packet.read_bits(6)
        self.amp_ofs = packet.read_bits(8)
        num_books = packet.read_bits(4) + 1
        if self.order < 1 or self.rate < 1 or self.bark_map_size < 1:
            raise InvalidDataError("Invalid floor 0 header")
        self.amp_div = (1 << self.amp_bits) - 1
        self.books = []
        for _ in range(num_books):
            num = packet.read_bits(8)
            if num < 0 or num >= len(codebooks):
                raise InvalidDataError("Invalid floor 0 codebook number")
            book = codebooks[num]
            if book.map_type == 0 or book.dimensions < 1:
                raise InvalidDataError("Invalid floor 0 codebook")
            self.books.append(book)
        self.book_bits = ilog(len(self.books))
        self._bark_maps = {
            block0_size: self._bark_curve(block0_size // 2),
            block1_size: self._bark_curve(block1_size // 2),
        }
        self._w_maps = {
            block0_size: self._wdel_map(block0_size // 2),
            block1_size: self._wdel_map(block1_size // 2),
        }

    @staticmethod
    def _to_bark(lsp):
        return np.float32(
            13.1 * np.arctan(0.00074 * lsp)
            + 2.24 * np.arctan(0.0000000185 * lsp * lsp)
            + 0.0001 * lsp
        )

    def _bark_curve(self, n):
        scale = self.bark_map_size / self._to_bark(self.rate / 2)
        m = np.zeros(n + 1, dtype=np.int64)
        for i in range(n - 1):
            m[i] = min(
                self.bark_map_size - 1,
                int(np.floor(self._to_bark((self.rate / 2.0) / n * i) * scale)),
            )
        m[n] = -1
        # NOTE: index n-1 stays 0, matching the reference loop bound (i < n-1)
        return m

    def _wdel_map(self, n):
        wdel = np.float32(np.pi / self.bark_map_size)
        return (2.0 * np.cos(wdel * np.arange(n, dtype=np.float64))).astype(np.float32)

    def unpack(self, packet, block_size, channel):
        amp = packet.read_bits(self.amp_bits)
        if amp <= 0:
            return Floor0Data(False)
        amp = np.float32(np.float32(amp) / self.amp_div * self.amp_ofs)
        book_num = packet.read_bits(self.book_bits)
        if book_num >= len(self.books):
            return Floor0Data(False)
        book = self.books[book_num]
        coeffs = np.zeros(self.order + 1, dtype=np.float32)
        i = 0
        while i < self.order:
            entry = book.decode_scalar(packet)
            if entry == -1:
                return Floor0Data(False)
            row = book.lookup[entry]
            j = 0
            while i < self.order and j < book.dimensions:
                coeffs[i] = row[j]
                i += 1
                j += 1
        # "averaging": add the last value of each vector to the next vector
        last = np.float32(0.0)
        j = 0
        while j < self.order:
            k = 0
            while j < self.order and k < book.dimensions:
                coeffs[j] += last
                j += 1
                k += 1
            last = coeffs[j - 1]
        return Floor0Data(True, amp, coeffs)

    def curve(self, data: Floor0Data, block_size: int) -> np.ndarray:
        """Evaluate the LSP filter response as per-bin linear gains.

        Reference: Floor0.Apply (152-212).
        """
        n = block_size // 2
        if not data.has_floor:
            return np.zeros(n, dtype=np.float32)
        bark_map = self._bark_maps[block_size]
        w_map = self._w_maps[block_size]
        coeffs = (2.0 * np.cos(data.coeffs[: self.order].astype(np.float64))).astype(
            np.float32
        )
        out = np.zeros(n, dtype=np.float32)
        i = 0
        order = self.order
        while i < n:
            k = bark_map[i]
            p = np.float32(0.5)
            q = np.float32(0.5)
            w = w_map[k]
            j = 1
            while j < order:
                q = np.float32(q * (w - coeffs[j - 1]))
                p = np.float32(p * (w - coeffs[j]))
                j += 2
            if j == order:
                # odd order
                q = np.float32(q * (w - coeffs[j - 1]))
                p = np.float32(p * p * (4.0 - w * w))
                q = np.float32(q * q)
            else:
                p = np.float32(p * p * (2.0 - w))
                q = np.float32(q * q * (2.0 + w))
            v = np.float32(data.amp / np.sqrt(p + q) - self.amp_ofs)
            v = np.float32(np.exp(v * np.float32(0.11512925)))
            out[i] = v
            while True:
                i += 1
                if i >= n or bark_map[i] != k:
                    break
                out[i] = v
        return out
