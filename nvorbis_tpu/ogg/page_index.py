"""Per-logical-stream page index for seekable sources.

Mirrors NVorbis/Ogg/StreamPageReader.cs: a list of page byte offsets (negated
when the page followed a resync or a sequence-number jump), granule
monotonicity validation, first-data-page tracking, granule->page lookup via
interpolated bisection or forward scan, and a small parsed-page cache.
"""

from nvorbis_tpu.errors import InvalidDataError


class PageRecord:
    __slots__ = (
        "granule_pos",
        "is_resync",
        "is_continuation",
        "is_continued",
        "packet_count",
        "overhead",
    )

    def __init__(self, granule_pos, is_resync, is_continuation, is_continued, packet_count, overhead):
        self.granule_pos = granule_pos
        self.is_resync = is_resync
        self.is_continuation = is_continuation
        self.is_continued = is_continued
        self.packet_count = packet_count
        self.overhead = overhead


class StreamPageIndex:
    """Index of one logical stream's pages within a physical reader."""

    _CACHE_MAX = 4

    def __init__(self, physical_reader, serial: int):
        self._reader = physical_reader  # SeekablePageReader
        self.serial = serial
        # strong ref to this stream's packet provider, as in the reference
        # (StreamPageReader.cs:9,_packetProvider): the container holds only
        # weak refs, so the provider must live exactly as long as its index
        # is routed (until EOS removal) or user code references it
        self.packet_provider = None
        self._offsets = []  # negative => resync page (StreamPageReader.cs:77-86)
        self._last_seq = 0
        self._first_data_page_index = None
        self._max_granule = 0
        self.has_all_pages = False
        self._raw_cache = {}  # page index -> RawPage
        self._cache_order = []
        self._rec_cache = {}  # page index -> PageRecord (bounded)

    # -- page ingestion (called by the physical reader) ---------------------

    def add_page(self, page) -> None:
        """Validate and index a freshly scanned page.

        Reference: StreamPageReader.AddPage (StreamPageReader.cs:44-90).
        """
        if self.has_all_pages:
            return

        gp = page.granule_pos
        if gp != -1:
            if self._first_data_page_index is None and gp > 0:
                self._first_data_page_index = len(self._offsets)
            elif self._max_granule > gp:
                raise InvalidDataError("Granule Position regressed?!")
            self._max_granule = gp
        elif self._first_data_page_index is not None and (
            not page.is_continued or page.packet_count != 1
        ):
            raise InvalidDataError(
                "Granule Position was -1 but page does not have exactly 1 continued packet."
            )

        if page.is_eos:
            self.has_all_pages = True

        if page.is_resync or (self._last_seq != 0 and self._last_seq + 1 != page.seq_no):
            self._offsets.append(-page.offset)
        else:
            self._offsets.append(page.offset)
        self._last_seq = page.seq_no

    def set_end_of_stream(self) -> None:
        self.has_all_pages = True

    # -- page access ---------------------------------------------------------

    @property
    def page_count(self) -> int:
        return len(self._offsets)

    @property
    def max_granule_position(self):
        return self._max_granule if self.has_all_pages else None

    @property
    def first_data_page_index(self) -> int:
        return self._find_first_data_page()

    def _get_raw(self, page_index: int):
        raw = self._raw_cache.get(page_index)
        if raw is None:
            offset = self._offsets[page_index]
            raw = self._reader.read_page_at(abs(offset))
            if raw is None:
                return None
            self._raw_cache[page_index] = raw
            self._cache_order.append(page_index)
            if len(self._cache_order) > self._CACHE_MAX:
                evict = self._cache_order.pop(0)
                self._raw_cache.pop(evict, None)
        return raw

    def get_page(self, page_index: int):
        """Return the PageRecord for ``page_index`` (reading forward as
        needed), or None.  Reference: StreamPageReader.GetPage
        (StreamPageReader.cs:292-367).  Records are memoized — the packet
        iterator consults the same page once per packet."""
        rec = self._rec_cache.get(page_index)
        if rec is not None:
            return rec
        while page_index >= len(self._offsets) and not self.has_all_pages:
            if not self._reader.read_next_page():
                break
        if page_index >= len(self._offsets):
            return None
        raw = self._get_raw(page_index)
        if raw is None:
            return None
        rec = PageRecord(
            granule_pos=raw.granule_pos,
            is_resync=self._offsets[page_index] < 0,
            is_continuation=raw.is_continuation,
            is_continued=raw.is_continued,
            packet_count=raw.packet_count,
            overhead=raw.overhead,
        )
        self._rec_cache[page_index] = rec
        if len(self._rec_cache) > 64:
            self._rec_cache.pop(next(iter(self._rec_cache)))
        return rec

    def get_page_packets(self, page_index: int):
        raw = self._get_raw(page_index)
        if raw is None:
            return []
        return raw.packets()

    # -- granule -> page lookup ---------------------------------------------

    def _granule_of(self, page_index: int):
        raw = self._get_raw(page_index)
        return None if raw is None else raw.granule_pos

    def _find_first_data_page(self) -> int:
        # read forward until a granule>0 page is seen (deviation from the
        # reference, which assumes the page has already been scanned;
        # StreamPageReader.cs:160-170)
        while self._first_data_page_index is None:
            if self.has_all_pages:
                return -1
            if not self._reader.read_next_page():
                return -1
        return self._first_data_page_index

    def find_page(self, granule_pos: int) -> int:
        """Find the index of the page containing ``granule_pos``.

        Reference: StreamPageReader.FindPage (StreamPageReader.cs:122-158).
        """
        page_index = -1
        if granule_pos == 0:
            page_index = self._find_first_data_page()
        else:
            last = len(self._offsets) - 1
            gp = self._granule_of(last) if last >= 0 else None
            if gp is not None:
                if granule_pos < gp:
                    page_index = self._find_page_bisection(
                        granule_pos, self._find_first_data_page(), last, gp
                    )
                elif granule_pos > gp:
                    page_index = self._find_page_forward(last, gp, granule_pos)
                else:
                    page_index = last + 1
        if page_index == -1:
            raise ValueError("granulePos is out of range")
        return page_index

    def _find_page_forward(self, page_index: int, page_gp: int, granule_pos: int) -> int:
        # Reference: StreamPageReader.FindPageForward (172-198)
        while page_gp <= granule_pos:
            page_index += 1
            if page_index == len(self._offsets):
                page_gp = self._read_next_page_granule()
                if page_gp is None:
                    if (self.max_granule_position or 0) < granule_pos:
                        page_index = -1
                    break
            else:
                gp = self._granule_of(page_index)
                if gp is None:
                    page_index = -1
                    break
                page_gp = gp
        return page_index

    def _read_next_page_granule(self):
        # Reference: StreamPageReader.GetNextPageGranulePos (200-227)
        page_count = len(self._offsets)
        while page_count == len(self._offsets) and not self.has_all_pages:
            if not self._reader.read_next_page():
                self.has_all_pages = True
                continue
            if page_count < len(self._offsets):
                return self._granule_of(len(self._offsets) - 1)
        return None

    def _find_page_bisection(self, granule_pos: int, low: int, high: int, high_gp: int) -> int:
        # Interpolated bisection assuming roughly uniform page durations.
        # Reference: StreamPageReader.FindPageBisection (229-265)
        low_gp = 0
        while high - low > 0:
            dist = high - low
            index = low + int(dist * ((granule_pos - low_gp) / float(high_gp - low_gp)))
            idx_gp = self._granule_of(index)
            if idx_gp is None:
                return -1
            if idx_gp > granule_pos:
                high = index
                high_gp = idx_gp
            elif idx_gp < granule_pos:
                low = index + 1
                low_gp = idx_gp + 1
            else:
                return index + 1
        return low
