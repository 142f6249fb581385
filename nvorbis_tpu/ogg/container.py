"""Ogg container entry point: physical page readers + logical stream routing.

Mirrors NVorbis/Ogg/ContainerReader.cs (seekable vs forward-only selection,
new-stream callback, container/waste bit accounting),
NVorbis/Ogg/PageReader.cs (seekable routing, per-serial stream page readers,
EOS removal so chained files with reused serials become new streams) and
NVorbis/Ogg/ForwardOnlyPageReader.cs.
"""

import io
import threading

from nvorbis_tpu.ogg.pages import PageScanner, read_page_at, FLAG_END_OF_STREAM
from nvorbis_tpu.ogg.page_index import StreamPageIndex
from nvorbis_tpu.ogg.packets import PacketProvider, ForwardOnlyPacketProvider


class _PhysicalReaderBase:
    def __init__(self, stream, new_stream_callback):
        self._stream = stream
        self._scanner = PageScanner(stream)
        self._new_stream_callback = new_stream_callback
        self._ignored_serials = set()
        self.container_bits = 0
        self._extra_waste_bits = 0
        # shared-container page reads are serialized, as in the reference
        # (PageReader.cs:95-113 Monitor): decoders for different logical
        # streams of one container may pull packets from separate threads.
        # Reentrant: _add_page callbacks (header parse) read further pages.
        self._lock = threading.RLock()

    @property
    def waste_bits(self) -> int:
        return self._scanner.waste_bits + self._extra_waste_bits

    def read_next_page(self) -> bool:
        """Scan pages until one is accepted by a logical stream.

        Reference: PageReaderBase.ReadNextPage (227-292).
        """
        with self._lock:
            while True:
                page = self._scanner.next_page()
                if page is None:
                    self._set_end_of_streams()
                    return False
                if page.serial in self._ignored_serials:
                    self._extra_waste_bits += len(page.buf) * 8
                    continue
                if self._add_page(page):
                    self.container_bits += 8 * page.overhead
                    return True
                self._ignored_serials.add(page.serial)
                self._extra_waste_bits += len(page.buf) * 8

    def _add_page(self, page) -> bool:
        raise NotImplementedError

    def _set_end_of_streams(self) -> None:
        raise NotImplementedError

    def dispose(self) -> None:
        self._set_end_of_streams()


class SeekablePageReader(_PhysicalReaderBase):
    """Seekable physical reader: routes pages into per-serial page indexes."""

    def __init__(self, stream, new_stream_callback):
        super().__init__(stream, new_stream_callback)
        self._stream_indexes = {}

    def _add_page(self, page) -> bool:
        # Reference: PageReader.AddPage (125-158).  Pages with zero packets
        # (all-zero lacing — e.g. a bare end-of-stream marker page) still
        # carry flags/granule and must reach the stream's index; only an
        # *unknown* serial starting with an empty page is rejected.
        idx = self._stream_indexes.get(page.serial)
        if page.packet_count == 0 and idx is None:
            return False
        if idx is not None:
            idx.add_page(page)
            if page.flags & FLAG_END_OF_STREAM:
                self._stream_indexes.pop(page.serial, None)
        else:
            idx = StreamPageIndex(self, page.serial)
            idx.add_page(page)
            # pre-seed the raw page cache so header decode avoids a re-read
            idx._raw_cache[idx.page_count - 1] = page
            idx._cache_order.append(idx.page_count - 1)
            provider = PacketProvider(idx, page.serial)
            idx.packet_provider = provider
            self._stream_indexes[page.serial] = idx
            if not self._new_stream_callback(provider):
                # the callback itself may have read to this stream's EOS page
                # (removing the entry) -- pop, don't del
                self._stream_indexes.pop(page.serial, None)
                return False
        return True

    def read_page_at(self, offset: int):
        # the scanner re-seeks to its own window before each fill, so it is
        # safe to move the stream here
        with self._lock:
            return read_page_at(self._stream, offset)

    def _set_end_of_streams(self) -> None:
        for idx in self._stream_indexes.values():
            idx.set_end_of_stream()
        self._stream_indexes.clear()


class ForwardOnlyPageReader(_PhysicalReaderBase):
    """Non-seekable physical reader: routes pages into FIFO packet providers."""

    def __init__(self, stream, new_stream_callback):
        super().__init__(stream, new_stream_callback)
        self._providers = {}

    def _add_page(self, page) -> bool:
        # Reference: ForwardOnlyPageReader.AddPage (21-54).  A zero-packet
        # page still carries its end-of-stream flag for a known serial.
        pp = self._providers.get(page.serial)
        if pp is not None:
            if pp.add_page(page, page.is_resync) or page.packet_count == 0:
                if page.flags & FLAG_END_OF_STREAM:
                    pp.set_end_of_stream()
                    del self._providers[page.serial]
                return True
            return False
        pp = ForwardOnlyPacketProvider(self, page.serial)
        if pp.add_page(page, page.is_resync):
            self._providers[page.serial] = pp
            if self._new_stream_callback(pp):
                return True
            del self._providers[page.serial]
        return False

    def _set_end_of_streams(self) -> None:
        for pp in self._providers.values():
            pp.set_end_of_stream()
        self._providers.clear()


def _is_seekable(stream) -> bool:
    try:
        return bool(stream.seekable())
    except AttributeError:
        return False


class ContainerReader:
    """Implements the Ogg container for Vorbis decoding.

    Reference: NVorbis/Ogg/ContainerReader.cs.
    """

    def __init__(self, source, close_on_dispose: bool = True):
        """``source`` may be a file path, bytes, or a binary file-like."""
        if isinstance(source, (str, bytes, bytearray)):
            if isinstance(source, str):
                stream = open(source, "rb")
                close_on_dispose = True
            else:
                stream = io.BytesIO(source)
        else:
            stream = source
        self._stream = stream
        self._close_on_dispose = close_on_dispose
        self.new_stream_callback = None
        self._packet_providers = []
        self._found_stream = False

        if _is_seekable(stream):
            self._reader = SeekablePageReader(stream, self._process_new_stream)
            self.can_seek = True
        else:
            self._reader = ForwardOnlyPageReader(stream, self._process_new_stream)
            self.can_seek = False

    # -- stream discovery -----------------------------------------------------

    def _process_new_stream(self, packet_provider) -> bool:
        cb = self.new_stream_callback
        if cb is None or cb(packet_provider):
            # weak reference, as in the reference (ContainerReader.cs:73,127):
            # an abandoned chained-stream provider (its decoder disposed and
            # its serial retired from the page reader) must be collectable
            import weakref

            self._packet_providers.append(weakref.ref(packet_provider))
            self._found_stream = True
            return True
        return False

    def try_init(self) -> bool:
        return self.find_next_stream()

    def find_next_stream(self) -> bool:
        """Read pages until a new logical stream appears.

        Reference: ContainerReader.FindNextStream (99-118).
        """
        self._found_stream = False
        while self._reader.read_next_page():
            if self._found_stream:
                return True
        return False

    def get_streams(self):
        """Live packet providers; collected ones are pruned
        (ContainerReader.cs:123-138)."""
        alive, live_refs = [], []
        for ref in self._packet_providers:
            pp = ref()
            if pp is not None:
                alive.append(pp)
                live_refs.append(ref)
        self._packet_providers = live_refs
        return alive

    # -- stats ---------------------------------------------------------------

    @property
    def container_bits(self) -> int:
        return self._reader.container_bits

    @property
    def waste_bits(self) -> int:
        return self._reader.waste_bits

    def dispose(self) -> None:
        if self._reader is not None:
            self._reader.dispose()
            self._reader = None
        if self._close_on_dispose and self._stream is not None:
            try:
                self._stream.close()
            except Exception:
                pass
        self._stream = None

    close = dispose

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.dispose()
