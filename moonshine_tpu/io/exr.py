"""OpenEXR scanline codec (pure numpy).

Fills the role of the reference's vendored tinyexr
(engine/fileformats/exr.zig wraps tinyexr load/save; offline writes
3-channel float EXR, skyboxes load as RGBA float). Implements the OpenEXR
2.0 single-part scanline format with NONE / ZIP / ZIPS compression — enough
to round-trip our own output and load typical float/half HDRIs. PIZ/other
compressions raise a clear error.

Layout facts used below (OpenEXR file format docs):
  * header = attribute list (name\\0 type\\0 size data), empty name ends it
  * channels are stored alphabetically; scanline chunk = [y:i32, size:i32,
    then per scanline, per channel, a full row]
  * ZIP chunks hold 16 scanlines (ZIPS: 1), zlib-compressed after a
    split-halves byte reorder + delta predictor
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = 20000630
PT_UINT, PT_HALF, PT_FLOAT = 0, 1, 2
NO_COMPRESSION, RLE, ZIPS, ZIP, PIZ = 0, 1, 2, 3, 4
_DTYPES = {PT_UINT: np.uint32, PT_HALF: np.float16, PT_FLOAT: np.float32}
_SIZES = {PT_UINT: 4, PT_HALF: 2, PT_FLOAT: 4}


# --- ZIP predictor/reorder (OpenEXR ImfZip) ---

def _zip_postprocess(raw: bytes) -> np.ndarray:
    data = np.frombuffer(raw, np.uint8).astype(np.int32)
    data = np.cumsum(np.concatenate([data[:1], data[1:] - 128]), dtype=np.int64)
    data = (data & 0xFF).astype(np.uint8)
    n = len(data)
    half = (n + 1) // 2
    out = np.empty(n, np.uint8)
    out[0::2] = data[:half]
    out[1::2] = data[half:]
    return out


def _zip_preprocess(data: np.ndarray) -> bytes:
    n = len(data)
    half = (n + 1) // 2
    tmp = np.empty(n, np.uint8)
    tmp[:half] = data[0::2]
    tmp[half:] = data[1::2]
    t = tmp.astype(np.int32)
    d = np.empty(n, np.int32)
    d[0] = t[0]
    d[1:] = t[1:] - t[:-1] + 128
    return (d & 0xFF).astype(np.uint8).tobytes()


# --- reading ---

def _read_attr_value(type_: bytes, data: bytes):
    if type_ == b"int":
        return struct.unpack("<i", data)[0]
    if type_ == b"float":
        return struct.unpack("<f", data)[0]
    if type_ == b"box2i":
        return struct.unpack("<4i", data)
    if type_ == b"chlist":
        channels = []
        off = 0
        while data[off] != 0:
            end = data.index(b"\x00", off)
            name = data[off:end].decode("latin-1")
            ptype, xs, ys = struct.unpack_from("<i4xii", data, end + 1)
            channels.append((name, ptype, xs, ys))
            off = end + 1 + 16
        return channels
    if type_ == b"compression" or type_ == b"lineOrder":
        return data[0]
    return data


def read_exr(path_or_bytes) -> np.ndarray:
    """Load an EXR as [H, W, 4] float32 RGBA (alpha=1 when absent), the
    reference's Rgba2D convention (exr.zig:208-229)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()

    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != MAGIC:
        raise ValueError("not an EXR file")
    if version & 0x200:
        raise ValueError("multi-part EXR not supported")
    off = 8

    attrs = {}
    while buf[off] != 0:
        end = buf.index(b"\x00", off)
        name = buf[off:end]
        off = end + 1
        end = buf.index(b"\x00", off)
        type_ = buf[off:end]
        off = end + 1
        (size,) = struct.unpack_from("<i", buf, off)
        off += 4
        attrs[name.decode()] = _read_attr_value(type_, buf[off : off + size])
        off += size
    off += 1  # header terminator

    channels = attrs["channels"]
    comp = attrs["compression"]
    x_min, y_min, x_max, y_max = attrs["dataWindow"]
    width = x_max - x_min + 1
    height = y_max - y_min + 1

    if comp == NO_COMPRESSION:
        lines_per_chunk = 1
    elif comp == ZIPS:
        lines_per_chunk = 1
    elif comp == ZIP:
        lines_per_chunk = 16
    else:
        raise ValueError(
            f"unsupported EXR compression {comp} (NONE/ZIP/ZIPS supported)"
        )

    n_chunks = (height + lines_per_chunk - 1) // lines_per_chunk
    off += 8 * n_chunks  # skip the offset table; chunks follow in order

    row_bytes = sum(_SIZES[c[1]] * width for c in channels)
    planes = {
        c[0]: np.zeros((height, width), np.float32) for c in channels
    }

    for _ in range(n_chunks):
        y, size = struct.unpack_from("<ii", buf, off)
        off += 8
        payload = buf[off : off + size]
        off += size
        n_lines = min(lines_per_chunk, y_max - y + 1)
        expected = row_bytes * n_lines
        if comp in (ZIP, ZIPS) and size != expected:
            raw = _zip_postprocess(zlib.decompress(payload)).tobytes()
        else:
            raw = payload
        pos = 0
        for line in range(n_lines):
            yy = y - y_min + line
            for name, ptype, _, _ in channels:
                nbytes = _SIZES[ptype] * width
                arr = np.frombuffer(raw, _DTYPES[ptype], width, pos)
                planes[name][yy] = arr.astype(np.float32)
                pos += nbytes

    out = np.ones((height, width, 4), np.float32)
    for i, ch in enumerate("RGBA"):
        if ch in planes:
            out[..., i] = planes[ch]
    if "Y" in planes and "R" not in planes:  # luminance-only
        out[..., 0] = out[..., 1] = out[..., 2] = planes["Y"]
    return out


# --- writing ---

def _attr(name: str, type_: str, data: bytes) -> bytes:
    return (
        name.encode() + b"\x00" + type_.encode() + b"\x00"
        + struct.pack("<i", len(data)) + data
    )


def write_exr(path, image: np.ndarray, compression: int = ZIP,
              pixel_type: int = PT_FLOAT) -> None:
    """Write [H, W, 3|4] float data as scanline EXR (3-channel float to
    match the reference's output format, exr.zig:137-206)."""
    image = np.asarray(image, np.float32)
    if image.ndim != 3 or image.shape[2] not in (3, 4):
        raise ValueError("image must be [H, W, 3|4]")
    H, W, C = image.shape
    names = ["B", "G", "R"] + (["A"] if C == 4 else [])
    # channel name -> image column, stored alphabetically
    src = {"R": 0, "G": 1, "B": 2, "A": 3}
    names = sorted(names)
    dtype = _DTYPES[pixel_type]

    chlist = b""
    for n in names:
        chlist += n.encode() + b"\x00" + struct.pack(
            "<i4xii", pixel_type, 1, 1
        )
    chlist += b"\x00"

    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header = b"".join(
        [
            _attr("channels", "chlist", chlist),
            _attr("compression", "compression", bytes([compression])),
            _attr("dataWindow", "box2i", box),
            _attr("displayWindow", "box2i", box),
            _attr("lineOrder", "lineOrder", b"\x00"),
            _attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
            _attr("screenWindowCenter", "v2f", struct.pack("<2f", 0, 0)),
            _attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
            b"\x00",
        ]
    )

    lines_per_chunk = 16 if compression == ZIP else 1
    n_chunks = (H + lines_per_chunk - 1) // lines_per_chunk

    chunks = []
    for ci in range(n_chunks):
        y0 = ci * lines_per_chunk
        n_lines = min(lines_per_chunk, H - y0)
        rows = []
        for line in range(n_lines):
            for n in names:
                rows.append(
                    np.ascontiguousarray(
                        image[y0 + line, :, src[n]].astype(dtype)
                    ).view(np.uint8)
                )
        raw = np.concatenate(rows)
        if compression in (ZIP, ZIPS):
            packed = zlib.compress(_zip_preprocess(raw), 6)
            if len(packed) >= len(raw):
                packed = raw.tobytes()
            payload = packed if isinstance(packed, bytes) else packed
        else:
            payload = raw.tobytes()
        chunks.append(struct.pack("<ii", y0, len(payload)) + payload)

    base = 8 + len(header) + 8 * n_chunks
    offsets = []
    pos = base
    for c in chunks:
        offsets.append(pos)
        pos += len(c)

    with open(path, "wb") as f:
        f.write(struct.pack("<ii", MAGIC, 2))
        f.write(header)
        f.write(struct.pack(f"<{n_chunks}Q", *offsets))
        for c in chunks:
            f.write(c)
