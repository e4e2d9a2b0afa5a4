"""OLE2 / Compound File Binary (MS-CFB) container walk — r5 third
session: the container under the LEGACY office formats (.doc, .xls,
.ppt, .msi) — the very doc-types BarkingOwl's matcher was built to
find. Family convention: stdlib struct only, deterministic output,
ValueError for corrupt input, NotImplementedError for
valid-but-unsupported shapes.

  * parse_cfb / list_cfb_members: header (512-byte v3 sectors; v4's
    4096-byte shape accepted via the declared sector shift), DIFAT
    (the 109 header entries + chained DIFAT sectors), FAT chain
    walk with cycle guards, directory tree flattened in entry order
    (UTF-16LE names, storage/stream/root types), and BOTH stream
    layouts: regular FAT-chained sectors and the MINI stream (
    streams under the 4096-byte cutoff live in 64-byte mini sectors
    chained through the miniFAT inside the root entry's stream).
  * read_cfb_stream: named-member random access (the officetext
    convention), exact to the directory's declared size.
  * build_cfb: the fixture writer — real FAT/miniFAT/DIFAT/
    directory sectors; sector chains are absolute ground truth the
    strict reader re-verifies (the xref-offset argument: writer and
    reader cannot drift in mutually-consistent ways because every
    chain index is checked against the actual file extent).

No stdlib module reads CFB, so (as with the image codecs) hand-built
sector layouts in tests pin the chain semantics independently of
the writer pair.
"""

from __future__ import annotations

import struct

CFB_MAGIC = bytes.fromhex("D0CF11E0A1B11AE1")

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_DIFSECT = 0xFFFFFFFC


class _Cfb:
    def __init__(self, payload: bytes):
        if payload[:8] != CFB_MAGIC:
            raise ValueError("not a CFB container (bad magic)")
        if len(payload) < 512:
            raise ValueError("truncated CFB header")
        (self.minor, self.major) = struct.unpack(
            "<HH", payload[24:28])
        (order,) = struct.unpack("<H", payload[28:30])
        if order != 0xFFFE:
            raise ValueError("CFB byte-order mark is not FFFE")
        (ss, mss) = struct.unpack("<HH", payload[30:34])
        if ss not in (9, 12) or mss != 6:
            raise NotImplementedError(
                f"CFB sector shift {ss}/{mss}")
        self.sec = 1 << ss
        self.mini_sec = 1 << mss
        (self.n_fat, self.dir_start, _trans, self.mini_cutoff,
         self.minifat_start, self.n_minifat, self.difat_start,
         self.n_difat) = struct.unpack("<IIIIIIII", payload[44:76])
        self.d = payload
        self.n_sectors = max(
            0, (len(payload) - 512 + self.sec - 1) // self.sec)

        # DIFAT: 109 header entries, then chained DIFAT sectors
        difat = list(struct.unpack("<109I", payload[76:512]))
        nxt = self.difat_start
        guard = 0
        per = self.sec // 4 - 1
        while nxt not in (_ENDOFCHAIN, _FREESECT):
            guard += 1
            if guard > self.n_sectors + 1:
                raise ValueError("CFB DIFAT chain cycle")
            raw = self._sector(nxt)
            vals = struct.unpack(f"<{per + 1}I", raw)
            difat.extend(vals[:per])
            nxt = vals[per]
        fat_sectors = [s for s in difat[:self.n_fat]
                       if s != _FREESECT]
        if len(fat_sectors) != self.n_fat:
            raise ValueError("CFB DIFAT shorter than declared FAT")
        self.fat: list[int] = []
        for s in fat_sectors:
            self.fat.extend(struct.unpack(
                f"<{self.sec // 4}I", self._sector(s)))

        # miniFAT
        self.minifat: list[int] = []
        for s in self._chain(self.minifat_start):
            self.minifat.extend(struct.unpack(
                f"<{self.sec // 4}I", self._sector(s)))

        # directory: 128-byte entries across the directory chain
        self.entries: list[tuple[str, int, int, int]] = []
        for s in self._chain(self.dir_start):
            raw = self._sector(s)
            for off in range(0, self.sec, 128):
                e = raw[off:off + 128]
                (nlen,) = struct.unpack("<H", e[64:66])
                typ = e[66]
                if typ == 0:
                    continue  # unused slot
                if not 2 <= nlen <= 64 or nlen % 2:
                    raise ValueError("bad CFB directory name length")
                name = e[:nlen - 2].decode("utf-16-le")
                (start,) = struct.unpack("<I", e[116:120])
                (size,) = struct.unpack("<Q", e[120:128])
                if self.major == 3:
                    size &= 0xFFFFFFFF  # v3: only the low dword
                self.entries.append((name, typ, start, size))
        if not self.entries or self.entries[0][1] != 5:
            raise ValueError("CFB directory missing root entry")
        # the mini stream is the ROOT entry's regular stream
        root = self.entries[0]
        self.mini = self._read_regular(root[2], root[3])

    def _sector(self, idx: int) -> bytes:
        off = 512 + idx * self.sec
        raw = self.d[off:off + self.sec]
        if len(raw) != self.sec:
            raise ValueError(f"CFB sector {idx} outside file")
        return raw

    def _chain(self, start: int) -> list[int]:
        out = []
        s = start
        while s != _ENDOFCHAIN:
            if s in (_FREESECT, _FATSECT, _DIFSECT):
                raise ValueError(f"CFB chain hits special {s:#x}")
            if s >= len(self.fat):
                raise ValueError("CFB chain outside FAT")
            out.append(s)
            if len(out) > self.n_sectors + 1:
                raise ValueError("CFB FAT chain cycle")
            s = self.fat[s]
        return out

    def _read_regular(self, start: int, size: int) -> bytes:
        if size == 0:
            return b""
        data = b"".join(self._sector(s) for s in self._chain(start))
        if len(data) < size:
            raise ValueError("CFB stream shorter than declared")
        return data[:size]

    def _read_mini(self, start: int, size: int) -> bytes:
        if size == 0:
            return b""
        out = bytearray()
        s = start
        guard = 0
        while s != _ENDOFCHAIN:
            if s >= len(self.minifat):
                raise ValueError("CFB mini chain outside miniFAT")
            off = s * self.mini_sec
            if off + self.mini_sec > len(self.mini):
                raise ValueError("CFB mini sector outside ministream")
            out += self.mini[off:off + self.mini_sec]
            guard += 1
            if guard > len(self.minifat) + 1:
                raise ValueError("CFB miniFAT chain cycle")
            s = self.minifat[s]
        if len(out) < size:
            raise ValueError("CFB mini stream shorter than declared")
        return bytes(out[:size])

    def read(self, name: str) -> bytes:
        for ename, typ, start, size in self.entries:
            if ename == name and typ == 2:
                if size < self.mini_cutoff:
                    return self._read_mini(start, size)
                return self._read_regular(start, size)
        raise ValueError(f"CFB stream {name!r} not found")


def parse_cfb(payload: bytes) -> _Cfb:
    try:
        return _Cfb(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt CFB: {e}") from e


def list_cfb_members(
    payload: bytes,
) -> list[tuple[str, str, int, bool]]:
    """payload -> [(name, kind, size, read_ok)] in directory order
    (root excluded); kind is 'stream' or 'storage'. read_ok proves
    the full chain walk actually delivered size bytes — a broken
    FAT cannot hide behind the directory's claim."""
    cfb = parse_cfb(payload)
    out = []
    for name, typ, start, size in cfb.entries[1:]:
        if typ == 1:
            out.append((name, "storage", 0, True))
        elif typ == 2:
            try:
                ok = len(cfb.read(name)) == size
            except ValueError:
                ok = False
            out.append((name, "stream", size, ok))
        else:
            raise ValueError(f"bad CFB entry type {typ}")
    return out


def read_cfb_stream(payload: bytes, name: str) -> bytes:
    return parse_cfb(payload).read(name)


# ---- fixture writer ------------------------------------------------------


def build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """[(name, data)] -> CFB v3 bytes: real FAT/miniFAT/directory
    sectors, streams under 4096 bytes in 64-byte mini sectors inside
    the root's mini stream, larger ones FAT-chained."""
    SEC = 512
    mini_cut = 4096

    minis = [(n, d) for n, d in streams if len(d) < mini_cut]
    bigs = [(n, d) for n, d in streams if len(d) >= mini_cut]

    # mini stream body + miniFAT chains
    mini_blob = bytearray()
    minifat: list[int] = []
    mini_starts: dict[str, int] = {}
    for n, d in minis:
        if not d:
            mini_starts[n] = _ENDOFCHAIN
            continue
        nsec = -(-len(d) // 64)
        first = len(minifat)
        mini_starts[n] = first
        for i in range(nsec):
            minifat.append(first + i + 1 if i + 1 < nsec
                           else _ENDOFCHAIN)
        mini_blob += d + b"\x00" * (-len(d) % 64)

    # sector plan: [FAT][dir...][minifat...][ministream...][bigs...]
    n_dir = -(-((2 + len(streams)) * 128) // SEC)
    n_mf = -(-len(minifat) // (SEC // 4)) if minifat else 0
    n_ms = -(-len(mini_blob) // SEC) if mini_blob else 0
    n_big = {n: -(-len(d) // SEC) for n, d in bigs}
    total = 1 + n_dir + n_mf + n_ms + sum(n_big.values())
    if total > SEC // 4:
        raise ValueError("fixture too large for one FAT sector")

    fat = [_FREESECT] * (SEC // 4)
    fat[0] = _FATSECT
    pos = 1
    dir_start = pos
    for i in range(n_dir):
        fat[pos + i] = pos + i + 1 if i + 1 < n_dir else _ENDOFCHAIN
    pos += n_dir
    mf_start = pos if n_mf else _ENDOFCHAIN
    for i in range(n_mf):
        fat[pos + i] = pos + i + 1 if i + 1 < n_mf else _ENDOFCHAIN
    pos += n_mf
    ms_start = pos if n_ms else _ENDOFCHAIN
    for i in range(n_ms):
        fat[pos + i] = pos + i + 1 if i + 1 < n_ms else _ENDOFCHAIN
    pos += n_ms
    big_starts: dict[str, int] = {}
    for n, d in bigs:
        big_starts[n] = pos
        k = n_big[n]
        for i in range(k):
            fat[pos + i] = pos + i + 1 if i + 1 < k else _ENDOFCHAIN
        pos += k

    def dirent(name: str, typ: int, start: int, size: int,
               child: int = _FREESECT) -> bytes:
        nb = name.encode("utf-16-le")
        if len(nb) > 62:
            raise ValueError("CFB name too long")
        e = bytearray(128)
        e[:len(nb)] = nb
        struct.pack_into("<H", e, 64, len(nb) + 2)
        e[66] = typ
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, _FREESECT, _FREESECT, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    ents = bytearray()
    ents += dirent("Root Entry", 5, ms_start, len(mini_blob),
                   child=1 if streams else _FREESECT)
    for n, d in streams:
        start = (big_starts[n] if n in big_starts
                 else mini_starts[n])
        ents += dirent(n, 2, start, len(d))
    ents += b"\x00" * (n_dir * SEC - len(ents))

    mf_blob = b"".join(struct.pack("<I", v) for v in minifat)
    mf_blob += b"\xff" * (n_mf * SEC - len(mf_blob))
    ms_blob = bytes(mini_blob) + b"\x00" * (-len(mini_blob) % SEC)
    big_blob = b"".join(
        d + b"\x00" * (-len(d) % SEC) for _, d in bigs)

    hdr = bytearray(512)
    hdr[:8] = CFB_MAGIC
    struct.pack_into("<HH", hdr, 24, 0x3E, 3)
    struct.pack_into("<H", hdr, 28, 0xFFFE)
    struct.pack_into("<HH", hdr, 30, 9, 6)
    struct.pack_into("<IIIIIIII", hdr, 44, 1, dir_start, 0,
                     mini_cut, mf_start, n_mf, _ENDOFCHAIN, 0)
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", hdr, 76, *difat)

    fat_blob = b"".join(struct.pack("<I", v) for v in fat)
    return (bytes(hdr) + fat_blob + bytes(ents) + mf_blob + ms_blob
            + big_blob)
