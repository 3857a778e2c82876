"""7z container reader (S1) — parser proven against hand-built
archives (no 7z library exists in the image to create fixtures, so
the test builds the container bytes from the public format spec;
round-tripping through the reader proves both directions)."""

from __future__ import annotations

import io
import lzma
import zlib

import pytest

from tempel_spark.sources.sevenzip import MAGIC, SevenZArchive


def _num(n: int) -> bytes:
    """7z NUMBER encoding (small-value forms exercise the reader's
    variable-length path; the 8-byte form its full path)."""
    if n < 0x80:
        return bytes([n])
    if n < 0x4000:
        return bytes([0x80 | (n >> 8), n & 0xFF])
    return b"\xff" + n.to_bytes(8, "little")


def _lzma1_pack(data: bytes) -> tuple[bytes, bytes]:
    """(props, raw packed stream) via the stdlib .lzma container."""
    alone = lzma.compress(data, format=lzma.FORMAT_ALONE)
    return alone[:5], alone[13:]


def _folder_bytes(coder_id: bytes, props: bytes) -> bytes:
    flags = len(coder_id) | (0x20 if props else 0)
    out = _num(1) + bytes([flags]) + coder_id
    if props:
        out += _num(len(props)) + props
    return out


def _names_block(names: list[str]) -> bytes:
    raw = b"\x00" + "".join(n + "\x00" for n in names).encode("utf-16-le")
    return _num(0x11) + _num(len(raw)) + raw


def _streams_info(
    pack_pos: int, pack_sizes: list[int], folder: bytes, unpack_size: int,
    substream_sizes: list[int] | None = None,
) -> bytes:
    out = _num(0x06) + _num(pack_pos) + _num(len(pack_sizes)) + _num(0x09)
    for s in pack_sizes:
        out += _num(s)
    out += _num(0x00)
    out += (
        _num(0x07) + _num(0x0B) + _num(1) + b"\x00" + folder
        + _num(0x0C) + _num(unpack_size) + _num(0x00)
    )
    if substream_sizes is not None:
        out += _num(0x08) + _num(0x0D) + _num(len(substream_sizes)) + _num(0x09)
        for s in substream_sizes[:-1]:  # last is implied
            out += _num(s)
        out += _num(0x00)  # end of SubStreamsInfo
    out += _num(0x00)
    return out


def _wrap(packed: bytes, header: bytes) -> bytes:
    start = (
        len(packed).to_bytes(8, "little")
        + len(header).to_bytes(8, "little")
        + zlib.crc32(header).to_bytes(4, "little")
    )
    return (
        MAGIC + b"\x00\x04" + zlib.crc32(start).to_bytes(4, "little")
        + start + packed + header
    )


def build_7z(
    members: dict[str, bytes] | list[tuple[str, bytes]],
    encoded_header: bool = False,
) -> bytes:
    """Single-folder LZMA1 archive with N members (substreams).
    A list of (name, bytes) pairs allows duplicate member names,
    which are legal in 7z."""
    items = list(members.items()) if isinstance(members, dict) else list(members)
    payload = b"".join(v for _, v in items)
    props, packed = _lzma1_pack(payload)
    folder = _folder_bytes(b"\x03\x01\x01", props)
    sizes = [len(v) for _, v in items]
    header = (
        _num(0x01)
        + _num(0x04)
        + _streams_info(0, [len(packed)], folder, len(payload),
                        substream_sizes=sizes if len(sizes) > 1 else None)
        + _num(0x05) + _num(len(items)) + _names_block([n for n, _ in items])
        + _num(0x00)
        + _num(0x00)
    )
    if not encoded_header:
        return _wrap(packed, header)
    hprops, hpacked = _lzma1_pack(header)
    hfolder = _folder_bytes(b"\x03\x01\x01", hprops)
    enc = _num(0x17) + _streams_info(len(packed), [len(hpacked)], hfolder, len(header))
    return _wrap(packed + hpacked, enc)


PAGE = (
    "<page><title>Falcon</title><ns>0</ns><id>11</id>"
    "<revision><id>7</id><timestamp>2014-02-01T00:00:00Z</timestamp>"
    "<text>[[Falcon Krypton|Falcon]] text body</text></revision></page>"
)


def test_roundtrip_single_member():
    data = ("line one\nline two\n" + PAGE).encode()
    ar = SevenZArchive(build_7z({"dump.xml": data}))
    assert ar.namelist() == ["dump.xml"]
    assert ar.read("dump.xml") == data
    lines = list(ar.iter_lines("dump.xml"))
    assert lines[0] == "line one\n"
    assert "".join(lines) == data.decode()


def test_roundtrip_multi_member_substreams():
    members = {"a.txt": b"alpha\nbeta\n", "b.txt": b"gamma " * 4000}
    ar = SevenZArchive(build_7z(members))
    assert ar.namelist() == ["a.txt", "b.txt"]
    for name, val in members.items():
        assert ar.read(name) == val
    # tiny chunk size forces the substream slicing across chunks
    got = b"".join(ar.iter_chunks("b.txt", chunk=7))
    assert got == members["b.txt"]


def test_duplicate_member_names_index_access():
    # duplicate names are legal in 7z; name lookup hits the first,
    # the positional form reaches every entry
    members = [("dump.xml", b"first copy\n"), ("dump.xml", b"second copy, different\n")]
    ar = SevenZArchive(build_7z(members))
    assert ar.namelist() == ["dump.xml", "dump.xml"]
    assert ar.read("dump.xml") == b"first copy\n"
    assert ar.read(0) == b"first copy\n"
    assert ar.read(1) == b"second copy, different\n"
    assert b"".join(ar.iter_chunks(1, chunk=5)) == b"second copy, different\n"


def test_encoded_header():
    data = b"payload under an LZMA-compressed metadata header\n" * 50
    ar = SevenZArchive(build_7z({"x": data}, encoded_header=True))
    assert ar.read("x") == data


def test_lzma2_and_bzip2_coders():
    data = b"zeta " * 1000
    raw = lzma.compress(
        data, format=lzma.FORMAT_RAW,
        filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}],
    )
    props = lzma._encode_filter_properties(  # noqa: SLF001 — stdlib private, same one 7z libs use
        {"id": lzma.FILTER_LZMA2, "preset": 6}
    )
    folder = _folder_bytes(b"\x21", props)
    header = (
        _num(0x01) + _num(0x04)
        + _streams_info(0, [len(raw)], folder, len(data))
        + _num(0x05) + _num(1) + _names_block(["z"]) + _num(0x00)
        + _num(0x00)
    )
    ar = SevenZArchive(_wrap(raw, header))
    assert ar.read("z") == data

    import bz2

    bpacked = bz2.compress(data)
    bheader = (
        _num(0x01) + _num(0x04)
        + _streams_info(0, [len(bpacked)], _folder_bytes(b"\x04\x02\x02", b""), len(data))
        + _num(0x05) + _num(1) + _names_block(["b"]) + _num(0x00)
        + _num(0x00)
    )
    ar2 = SevenZArchive(_wrap(bpacked, bheader))
    assert ar2.read("b") == data


def test_unsupported_coder_raises():
    header = (
        _num(0x01) + _num(0x04)
        + _streams_info(0, [4], _folder_bytes(b"\x06\xf1\x07\x01", b""), 4)  # AES id
        + _num(0x05) + _num(1) + _names_block(["s"]) + _num(0x00)
        + _num(0x00)
    )
    ar = SevenZArchive(_wrap(b"\x00\x00\x00\x00", header))
    with pytest.raises(NotImplementedError):
        ar.read("s")


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        SevenZArchive(b"PK\x03\x04 not a seven zip")


def test_iter_all_single_folder_pass_and_utf8_boundaries():
    """iter_all slices every member out of ONE folder decompression,
    and byte-level consumers survive multi-byte UTF-8 characters
    straddling any chunk boundary (chunk=1 forces every straddle)."""
    members = {"a.xml": "héllo wörld é".encode(), "b.xml": "çafé".encode()}
    ar = SevenZArchive(build_7z(members))
    got: dict[str, bytes] = {}
    for name, piece in ar.iter_all(chunk=1):
        got[name] = got.get(name, b"") + piece
    assert got == members


def test_chained_bzip2_streams():
    """7z multithreaded BZip2 folders concatenate independent bz2
    streams; the decompressor must re-chain at each stream end."""
    import bz2

    part1, part2 = b"alpha " * 200, b"omega " * 300
    packed = bz2.compress(part1) + bz2.compress(part2)
    data = part1 + part2
    header = (
        _num(0x01) + _num(0x04)
        + _streams_info(0, [len(packed)], _folder_bytes(b"\x04\x02\x02", b""), len(data))
        + _num(0x05) + _num(1) + _names_block(["m"]) + _num(0x00)
        + _num(0x00)
    )
    ar = SevenZArchive(_wrap(packed, header))
    assert ar.read("m") == data


def test_substream_crc_excludes_folder_digest_streams():
    """7zFormat.txt digest rule: SubStreamsInfo kCRC stores digests
    only for substreams whose CRC is not already known from a
    folder-level digest. Two folders — one single-substream with a
    folder CRC, one with three substreams — must parse with exactly
    3 digests, not 4."""
    import io

    from tempel_spark.sources.sevenzip import _parse_streams_info

    folder = _folder_bytes(b"\x00", b"")  # copy coder
    blob = (
        # PackInfo: two packed streams of 10 and 30 bytes
        _num(0x06) + _num(0) + _num(2) + _num(0x09) + _num(10) + _num(30) + _num(0x00)
        # UnpackInfo: 2 folders + folder-level CRC defined ONLY for folder 0
        + _num(0x07) + _num(0x0B) + _num(2) + b"\x00" + folder + folder
        + _num(0x0C) + _num(10) + _num(30)
        + _num(0x0A) + b"\x00" + b"\x80" + b"\xde\xad\xbe\xef"  # bit vector 10 → 1 digest
        + _num(0x00)
        # SubStreamsInfo: folder0 → 1 substream, folder1 → 3; sizes for
        # folder1's first two; kCRC with 3 digests (folder1's only)
        + _num(0x08)
        + _num(0x0D) + _num(1) + _num(3)
        + _num(0x09) + _num(5) + _num(10)
        + _num(0x0A) + b"\x01" + b"\x01\x02\x03\x04" * 3  # allDefined + 3 digests
        + _num(0x00)
        + _num(0x00)
    )
    info = _parse_streams_info(io.BytesIO(blob))
    assert [f.num_substreams for f in info.folders] == [1, 3]
    assert info.folders[0].crc_defined and not info.folders[1].crc_defined
    assert info.folders[1].substream_sizes == [5, 10, 15]


PAGE2 = (
    "<page><title>Krypton</title><ns>0</ns><id>12</id>"
    "<revision><id>8</id><timestamp>2015-03-01T00:00:00Z</timestamp>"
    "<text>body two</text></revision>"
    "<revision><id>9</id><timestamp>2015-04-01T00:00:00Z</timestamp>"
    "<text>body three</text></revision></page>"
)


def test_read_revision_history_7z(spark, tmp_path):
    from tempel_spark.sources.xml_history import read_revision_history_7z

    blob = build_7z({"part1.xml": ("<mediawiki>" + PAGE + PAGE2 + "</mediawiki>").encode()})
    (tmp_path / "dump.7z").write_bytes(blob)
    rows = read_revision_history_7z(spark, str(tmp_path / "dump.7z")).collect()
    assert {(r.title, r.rev_id) for r in rows} == {("Falcon", 7), ("Krypton", 8), ("Krypton", 9)}
    assert all(r.page_id in (11, 12) for r in rows)


def test_read_text_7z(spark, tmp_path):
    from tempel_spark.sources.sevenzip import read_text_7z

    blob = build_7z({"a.txt": b"alpha\nbeta", "b.txt": b"gamma\n"})
    (tmp_path / "x.7z").write_bytes(blob)
    rows = read_text_7z(spark, str(tmp_path / "x.7z")).collect()
    got = {(r.member, r.line) for r in rows}
    assert got == {("a.txt", "alpha"), ("a.txt", "beta"), ("b.txt", "gamma")}
