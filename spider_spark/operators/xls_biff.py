"""Stdlib legacy ``.xls`` (BIFF8) reader/writer — no xlrd/xlwt needed.

The reference reads geocoding input workbooks with xlrd and writes result
workbooks with xlwt (/root/reference/getDirection.py:62-118,
/root/reference/getGeocode.py:56-99) — both the legacy binary ``.xls``
format, not zip-XML ``.xlsx``. A ``.xls`` file is two published layers:

* the OLE2 / Compound File Binary container ([MS-CFB]): 512-byte header,
  a FAT of 4-byte sector chains, a directory of 128-byte entries, and —
  for streams under 4096 bytes — a mini-FAT over a 64-byte-sector mini
  stream stored in the root entry;
* the BIFF8 record stream ([MS-XLS]) named ``Workbook``: (opcode u16,
  length u16, payload) records — workbook globals (BOF, SST with
  CONTINUE spill-over, BOUNDSHEET) followed by one substream per sheet
  (BOF, cell records, EOF).

Both layers are ``struct.pack`` territory, so this module implements the
minimal honest profile: cell types number (NUMBER/RK/MULRK), shared and
inline strings (LABELSST/LABEL, incl. continued SST strings), booleans
(BOOLERR), blanks; one or more worksheets. Not covered (documented, and
rejected loudly rather than mis-read): BIFF5 and earlier, encrypted
workbooks (FILEPASS), date *formatting* (dates come back as raw Excel
serial numbers — the same behaviour xlrd has without a datemode
conversion), and DIFAT chains beyond the 109 header slots (~7 MB of FAT,
i.e. multi-GB workbooks — far past Excel's own 65 536-row sheet cap).
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD

# BIFF8 record opcodes
_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_LABEL = 0x0204
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FILEPASS = 0x002F
_CODEPAGE = 0x0042
_DIMENSIONS = 0x0200


# ---------------------------------------------------------------------------
# OLE2 / CFB container
# ---------------------------------------------------------------------------


def _cfb_streams(data: bytes) -> dict[str, bytes]:
    """Parse a CFB container into {stream_name: bytes}."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    (
        sect_shift,
        mini_shift,
    ) = struct.unpack("<HH", data[30:34])
    if sect_shift != 9:
        raise ValueError(f"unsupported CFB sector size 2^{sect_shift}")
    sect_size, mini_size = 1 << sect_shift, 1 << mini_shift
    (n_fat,) = struct.unpack("<I", data[44:48])
    (dir_start,) = struct.unpack("<I", data[48:52])
    (mini_cutoff,) = struct.unpack("<I", data[56:60])
    (minifat_start,) = struct.unpack("<I", data[60:64])
    (n_minifat,) = struct.unpack("<I", data[64:68])
    (difat_start,) = struct.unpack("<I", data[68:72])
    (n_difat,) = struct.unpack("<I", data[72:76])
    if n_difat or difat_start not in (_ENDOFCHAIN, _FREESECT):
        raise ValueError("DIFAT chains beyond the header are not supported")

    def sector(i: int) -> bytes:
        off = 512 + i * sect_size
        return data[off : off + sect_size]

    difat = struct.unpack("<109I", data[76:512])
    fat: list[int] = []
    for s in difat[:n_fat]:
        fat.extend(struct.unpack(f"<{sect_size // 4}I", sector(s)))

    def chain(start: int) -> bytes:
        out, s, hops = bytearray(), start, 0
        while s != _ENDOFCHAIN:
            if s >= len(fat) or hops > len(fat):
                raise ValueError("broken FAT chain")
            out += sector(s)
            s = fat[s]
            hops += 1
        return bytes(out)

    dirdata = chain(dir_start)
    entries = []
    for off in range(0, len(dirdata), 128):
        e = dirdata[off : off + 128]
        (cb_name,) = struct.unpack("<H", e[64:66])
        etype = e[66]
        if etype == 0 or cb_name < 2:
            continue
        name = e[: cb_name - 2].decode("utf-16-le")
        (start,) = struct.unpack("<I", e[116:120])
        (size,) = struct.unpack("<I", e[120:124])
        entries.append((name, etype, start, size))

    root = next(e for e in entries if e[1] == 5)
    ministream = chain(root[2])[: root[3]] if root[2] != _ENDOFCHAIN else b""
    minifat: list[int] = []
    if n_minifat and minifat_start != _ENDOFCHAIN:
        mf = chain(minifat_start)
        minifat = list(struct.unpack(f"<{len(mf) // 4}I", mf))

    def mini_chain(start: int) -> bytes:
        out, s, hops = bytearray(), start, 0
        while s != _ENDOFCHAIN:
            if s >= len(minifat) or hops > len(minifat):
                raise ValueError("broken mini-FAT chain")
            out += ministream[s * mini_size : (s + 1) * mini_size]
            s = minifat[s]
            hops += 1
        return bytes(out)

    streams = {}
    for name, etype, start, size in entries:
        if etype != 2:
            continue
        raw = mini_chain(start) if size < mini_cutoff else chain(start)
        streams[name] = raw[:size]
    return streams


def _cfb_write(stream_name: str, payload: bytes) -> bytes:
    """Serialize one stream into a minimal CFB container (mini stream for
    payloads under the 4096-byte cutoff, regular FAT chain above)."""
    sect = 512

    def pad(b: bytes, size: int) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    def dir_entry(name: str, etype: int, color: int, left: int, right: int,
                  child: int, start: int, size: int) -> bytes:
        n = name.encode("utf-16-le")
        return (
            pad(n, 64)[:64]
            + struct.pack("<HBB", len(n) + 2, etype, color)
            + struct.pack("<iii", left, right, child)
            + b"\x00" * 16  # clsid
            + b"\x00" * 4   # state
            + b"\x00" * 16  # ctime/mtime
            + struct.pack("<II", start, size)
            + b"\x00" * 4
        )

    mini = len(payload) < 4096
    if mini:
        ministream = pad(payload, 64)
        n_mini = len(ministream) // 64
        minifat = list(range(1, n_mini)) + [_ENDOFCHAIN]
        minifat_sec = pad(struct.pack(f"<{n_mini}I", *minifat), sect)
        if len(minifat_sec) != sect:
            raise ValueError("mini stream too large for one mini-FAT sector")
        ms_secs = len(pad(ministream, sect)) // sect
        # sector layout: [fat] [dir] [minifat] [ministream...]
        n_total = 3 + ms_secs
        fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
        fat += [3 + i + 1 for i in range(ms_secs - 1)] + [_ENDOFCHAIN]
        body = minifat_sec + pad(ministream, sect)
        root_start, root_size = 3, n_mini * 64
        wb_start, wb_size = 0, len(payload)
        minifat_start, n_minifat = 2, 1
    else:
        stream = pad(payload, sect)
        s_secs = len(stream) // sect
        # FAT sectors needed: solve for n_fat covering n_fat+1+s_secs ids
        n_fat = 1
        while n_fat * (sect // 4) < n_fat + 1 + s_secs:
            n_fat += 1
        if n_fat > 109:
            raise ValueError("workbook too large for header-DIFAT-only CFB")
        first_stream = n_fat + 1
        fat = [_FATSECT] * n_fat + [_ENDOFCHAIN]  # fat sectors + dir
        fat += [first_stream + i + 1 for i in range(s_secs - 1)] + [_ENDOFCHAIN]
        n_total = n_fat + 1 + s_secs
        body = stream
        root_start, root_size = _ENDOFCHAIN, 0
        wb_start, wb_size = first_stream, len(payload)
        minifat_start, n_minifat = _ENDOFCHAIN, 0

    n_fat_secs = fat.count(_FATSECT)
    fat_bytes = pad(struct.pack(f"<{len(fat)}I", *fat)
                    + b"\xff" * 0, sect * n_fat_secs)
    # FREESECT-fill the FAT remainder
    fat_bytes = fat_bytes[: len(fat) * 4] + b"\xff" * (
        sect * n_fat_secs - len(fat) * 4
    )

    dirs = (
        dir_entry("Root Entry", 5, 1, -1, -1, 1, root_start, root_size)
        + dir_entry(stream_name, 2, 1, -1, -1, -1, wb_start, wb_size)
        + b"\x00" * 128 * 2
    )
    assert len(dirs) == sect

    difat = [i for i in range(n_fat_secs)] + [_FREESECT] * (109 - n_fat_secs)
    header = (
        _CFB_MAGIC
        + b"\x00" * 16                       # clsid
        + struct.pack("<HH", 0x003E, 0x0003)  # minor, major (v3)
        + struct.pack("<H", 0xFFFE)           # little-endian
        + struct.pack("<HH", 9, 6)            # sector / mini shifts
        + b"\x00" * 6
        + struct.pack("<I", 0)                # dir sector count (v3: 0)
        + struct.pack("<I", n_fat_secs)
        + struct.pack("<I", n_fat_secs)       # dir start = after FAT secs
        + struct.pack("<I", 0)                # transaction signature
        + struct.pack("<I", 4096)             # mini cutoff
        + struct.pack("<I", minifat_start)
        + struct.pack("<I", n_minifat)
        + struct.pack("<I", _ENDOFCHAIN)      # DIFAT start
        + struct.pack("<I", 0)                # DIFAT count
        + struct.pack("<109I", *[d & 0xFFFFFFFF for d in difat])
    )
    assert len(header) == 512
    out = header + fat_bytes + dirs + body
    assert len(out) == 512 + sect * n_total
    return out


# ---------------------------------------------------------------------------
# BIFF8 record stream
# ---------------------------------------------------------------------------


class _RecordReader:
    """Sequential BIFF record reader with CONTINUE-aware string decoding:
    an SST string may spill across record boundaries, and each CONTINUE
    fragment re-states its own compressed/utf-16 option byte — the classic
    BIFF8 pitfall."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.rec_end = pos  # current record payload end
        self.opcode = None

    def next_record(self) -> bool:
        if self.rec_end + 4 > len(self.data):
            return False
        self.opcode, length = struct.unpack(
            "<HH", self.data[self.rec_end : self.rec_end + 4]
        )
        self.pos = self.rec_end + 4
        self.rec_end = self.pos + length
        return True

    # --- primitives that may cross into CONTINUE records -----------------
    def _ensure(self) -> None:
        while self.pos >= self.rec_end:
            if not self.next_record() or self.opcode != _CONTINUE:
                raise ValueError("BIFF stream truncated inside a record")

    def take(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._ensure()
            avail = min(n, self.rec_end - self.pos)
            out += self.data[self.pos : self.pos + avail]
            self.pos += avail
            n -= avail
        return bytes(out)

    def u8(self) -> int:
        return self.take(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.take(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.take(4))[0]

    def unistr(self) -> str:
        """XLUnicodeRichExtendedString: chars may spill into CONTINUE
        records, where the continuation restarts with a fresh grbit."""
        cch = self.u16()
        grbit = self.u8()
        n_runs = self.u16() if grbit & 0x08 else 0
        cb_ext = self.u32() if grbit & 0x04 else 0
        wide = grbit & 0x01
        chars: list[str] = []
        remaining = cch
        while remaining:
            if self.pos >= self.rec_end:
                self._ensure()
                wide = self.u8() & 0x01  # continuation re-states the flag
            avail = self.rec_end - self.pos
            take = min(remaining, avail // 2 if wide else avail)
            raw = self.data[self.pos : self.pos + take * (2 if wide else 1)]
            self.pos += len(raw)
            chars.append(
                raw.decode("utf-16-le") if wide else raw.decode("latin-1")
            )
            remaining -= take
        self.take(4 * n_runs + cb_ext)  # rich-text runs / phonetic block
        return "".join(chars)


def _rk_value(rk: int):
    """RK-packed number: bit0 = divide by 100, bit1 = 30-bit int vs
    truncated IEEE double."""
    if rk & 0x02:
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        return v / 100 if rk & 0x01 else v
    (d,) = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))
    return d / 100 if rk & 0x01 else d


def read_xls_rows(path: str, sheet: int | str = 0) -> list[list]:
    """Legacy ``.xls`` → dense list-of-rows (None for gaps), mirroring
    :func:`spider_spark.operators.xlsx.read_xlsx_rows`."""
    with open(path, "rb") as f:
        data = f.read()
    streams = _cfb_streams(data)
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise ValueError(f"no Workbook stream in {path} (streams: {sorted(streams)})")

    # ---- workbook globals: SST + BOUNDSHEETs ----
    r = _RecordReader(wb)
    if not r.next_record() or r.opcode != _BOF:
        raise ValueError("missing workbook BOF")
    version, substream = struct.unpack("<HH", wb[r.pos : r.pos + 4])
    if version != 0x0600:
        raise ValueError(f"only BIFF8 supported, got BOF version {version:#x}")
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []
    while r.next_record():
        if r.opcode == _EOF:
            break
        if r.opcode == _FILEPASS:
            raise ValueError("encrypted .xls not supported")
        if r.opcode == _BOUNDSHEET:
            offset = r.u32()
            r.take(2)  # visibility + type
            cch = r.u8()
            grbit = r.u8()
            raw = r.take(cch * (2 if grbit & 1 else 1))
            name = raw.decode("utf-16-le" if grbit & 1 else "latin-1")
            sheets.append((name, offset))
        elif r.opcode == _SST:
            r.take(4)  # total refs
            n_unique = r.u32()
            for _ in range(n_unique):
                sst.append(r.unistr())

    if not sheets:
        raise ValueError("workbook has no sheets")
    if isinstance(sheet, str):
        match = [o for (n, o) in sheets if n == sheet]
        if not match:
            raise ValueError(f"sheet {sheet!r} not in {[n for n, _ in sheets]}")
        offset = match[0]
    else:
        offset = sheets[sheet][1]

    # ---- worksheet substream ----
    cells: dict[tuple[int, int], object] = {}
    r = _RecordReader(wb, offset)
    if not r.next_record() or r.opcode != _BOF:
        raise ValueError("missing worksheet BOF")
    while r.next_record():
        op = r.opcode
        if op == _EOF:
            break
        if op == _NUMBER:
            row, col, _ = r.u16(), r.u16(), r.u16()
            (v,) = struct.unpack("<d", r.take(8))
            cells[(row, col)] = v
        elif op == _RK:
            row, col, _ = r.u16(), r.u16(), r.u16()
            cells[(row, col)] = _rk_value(r.u32())
        elif op == _MULRK:
            row, col = r.u16(), r.u16()
            # payload tail: n x (ixfe u16 + rk u32), then colLast u16
            n = (r.rec_end - r.pos - 2) // 6
            for i in range(n):
                r.u16()
                cells[(row, col + i)] = _rk_value(r.u32())
            r.u16()  # colLast
        elif op == _LABELSST:
            row, col, _ = r.u16(), r.u16(), r.u16()
            cells[(row, col)] = sst[r.u32()]
        elif op == _LABEL:
            row, col, _ = r.u16(), r.u16(), r.u16()
            cells[(row, col)] = r.unistr()
        elif op == _BOOLERR:
            row, col, _ = r.u16(), r.u16(), r.u16()
            val, is_err = r.u8(), r.u8()
            cells[(row, col)] = None if is_err else bool(val)
        # BLANK / MULBLANK / FORMULA / formatting records: skipped

    if not cells:
        return []
    n_rows = max(rc[0] for rc in cells) + 1
    n_cols = max(rc[1] for rc in cells) + 1
    return [
        [cells.get((ri, ci)) for ci in range(n_cols)] for ri in range(n_rows)
    ]


def _rec(opcode: int, payload: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(payload)) + payload


def _unistr(s: str, short: bool = False) -> bytes:
    wide = any(ord(c) > 0xFF for c in s)
    head = struct.pack("<BB" if short else "<HB", len(s), 1 if wide else 0)
    return head + s.encode("utf-16-le" if wide else "latin-1")


def write_xls(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Minimal BIFF8 writer (the reference's xlwt role): one worksheet,
    numbers as NUMBER/RK, strings via a shared-string table, booleans as
    BOOLERR, None as a gap. Strings larger than one record are not split
    (per-cell cap ~8 KB — Excel's own cell cap is 32 767 chars but the
    fixture/sink rows are far below the record limit)."""
    strings: dict[str, int] = {}
    n_refs = 0
    for row in rows:
        for v in row:
            if isinstance(v, str):
                n_refs += 1
                strings.setdefault(v, len(strings))

    sheet = bytearray()
    sheet += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x3515, 0x07CC, 0, 0))
    sheet += _rec(
        _DIMENSIONS,
        struct.pack("<IIHHH", 0, len(rows), 0,
                    max((len(r) for r in rows), default=0), 0),
    )
    for ri, row in enumerate(rows):
        for ci, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                sheet += _rec(
                    _BOOLERR, struct.pack("<HHHBB", ri, ci, 0, int(v), 0)
                )
            elif isinstance(v, int) and -(2**29) <= v < 2**29:
                sheet += _rec(
                    _RK, struct.pack("<HHHI", ri, ci, 0, ((v << 2) | 0x02) & 0xFFFFFFFF)
                )
            elif isinstance(v, (int, float)):
                sheet += _rec(
                    _NUMBER, struct.pack("<HHH", ri, ci, 0) + struct.pack("<d", float(v))
                )
            elif isinstance(v, str):
                sheet += _rec(
                    _LABELSST, struct.pack("<HHHI", ri, ci, 0, strings[v])
                )
            else:
                raise TypeError(f"unsupported cell type {type(v).__name__}")
    sheet += _rec(_EOF, b"")

    globals_ = bytearray()
    globals_ += _rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x3515, 0x07CC, 0, 0))
    globals_ += _rec(_CODEPAGE, struct.pack("<H", 1200))
    # SST spills into CONTINUE records at string boundaries (the simplest
    # spec-valid split; the reader also handles mid-string splits, which
    # real Excel emits but this writer never needs to)
    sst_records: list[bytes] = []
    cur = bytearray(struct.pack("<II", n_refs, len(strings)))
    for s in strings:
        enc = _unistr(s)
        if len(enc) > 8192:
            raise ValueError(
                "cell string too large for the minimal writer "
                "(no mid-string CONTINUE split)"
            )
        if len(cur) + len(enc) > 8192:
            sst_records.append(
                _rec(_SST if not sst_records else _CONTINUE, bytes(cur))
            )
            cur = bytearray()
        cur += enc
    sst_records.append(_rec(_SST if not sst_records else _CONTINUE, bytes(cur)))
    # BOUNDSHEET offset backpatched after globals length is known
    bs_payload = struct.pack("<IBB", 0, 0, 0) + _unistr(sheet_name, short=True)[:]
    bs = _rec(_BOUNDSHEET, bs_payload)
    tail = b"".join(sst_records) + _rec(_EOF, b"")
    sheet_offset = len(globals_) + len(bs) + len(tail)
    bs = _rec(
        _BOUNDSHEET,
        struct.pack("<IBB", sheet_offset, 0, 0) + _unistr(sheet_name, short=True),
    )
    wb = bytes(globals_) + bs + tail + bytes(sheet)
    with open(path, "wb") as f:
        f.write(_cfb_write("Workbook", wb))
