"""Mapbox Vector Tile (MVT 2.1) codec — pure-python protobuf wire codec.

Re-implements the reference's MVT surface
(versatiles_geometry/src/vector_tile/{tile,layer,feature}.rs):
Tile{layers}, Layer{version, name, features, keys, values, extent},
Feature{id, tags, type, geometry} with shared key/value tables and
zigzag-encoded geometry commands, from the public MVT 2.1 spec.

Decoded form is a plain dict tree (layers -> features with resolved
`properties`), encoded form is deterministic: keys/values in
first-seen order per layer, layers in input order (callers that merge
sort layer names first — the reference's HashMap order is
unspecified, SURVEY.md §7.4 hard part 3, so deterministic order here
is part of the engine contract).
"""

from __future__ import annotations

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
_TYPE_NAMES = {0: "unknown", 1: "point", 2: "linestring", 3: "polygon"}


# ---- protobuf wire primitives ----------------------------------------


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _write_varint(out: bytearray, value: int):
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes):
    """Iterate (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            value = buf[pos : pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            value = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:  # 64-bit
            value = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, value


def _write_field(out: bytearray, field: int, wire: int, value):
    _write_varint(out, (field << 3) | wire)
    if wire == 0:
        _write_varint(out, value)
    elif wire == 2:
        _write_varint(out, len(value))
        out.extend(value)
    else:
        out.extend(value)


# ---- MVT Value --------------------------------------------------------


class Float32(float):
    """A decoded MVT float value (Value field 2). Compares/behaves as a
    plain float but re-encodes as float32, so decode->encode paths
    (merge_tiles, vector filter ops) preserve the wire variant —
    matching the reference's GeoValue::Float vs Double distinction
    (versatiles_geometry/src/geo/value.rs:24-40)."""

    __slots__ = ()


class Int64(int):
    """Decoded MVT int_value (Value field 4); re-encodes as field 4."""

    __slots__ = ()


class SInt64(int):
    """Decoded MVT sint_value (Value field 6); re-encodes zigzag."""

    __slots__ = ()


def _decode_value(buf: bytes):
    import struct

    for field, _wire, value in _fields(buf):
        if field == 1:
            return value.decode("utf-8")
        if field == 2:
            return Float32(struct.unpack("<f", value)[0])
        if field == 3:
            return struct.unpack("<d", value)[0]
        if field == 4:
            return Int64(value - (1 << 64) if value >= (1 << 63) else value)
        if field == 5:
            return value  # uint64 (plain int = uint default)
        if field == 6:
            return SInt64(_unzigzag(value))
        if field == 7:
            return bool(value)
    return None


def _encode_value(v) -> bytes:
    import struct

    out = bytearray()
    if isinstance(v, bool):  # before int: bool subclasses int
        _write_field(out, 7, 0, int(v))
    elif isinstance(v, str):
        _write_field(out, 1, 2, v.encode("utf-8"))
    elif isinstance(v, Float32):  # before float: preserve decoded variant
        _write_field(out, 2, 5, struct.pack("<f", v))
    elif isinstance(v, float):
        _write_field(out, 3, 1, struct.pack("<d", v))
    elif isinstance(v, Int64):
        _write_field(out, 4, 0, (int(v) + (1 << 64)) if v < 0 else int(v))
    elif isinstance(v, SInt64):
        _write_field(out, 6, 0, _zigzag(int(v)))
    elif isinstance(v, int):
        if v >= 0:
            _write_field(out, 5, 0, v)
        else:
            _write_field(out, 6, 0, _zigzag(v))
    else:
        raise TypeError(f"unsupported property value {type(v)}")
    return bytes(out)


# ---- geometry commands ------------------------------------------------


def decode_geometry(commands, geom_type: int):
    """Geometry command stream -> list of rings/lines of (x, y) int pairs."""
    parts = []
    current = []
    x = y = 0
    i = 0
    n = len(commands)
    while i < n:
        cmd = commands[i]
        i += 1
        op, count = cmd & 7, cmd >> 3
        if op == 1:  # MoveTo
            for _ in range(count):
                if current:
                    parts.append(current)
                    current = []
                x += _unzigzag(commands[i])
                y += _unzigzag(commands[i + 1])
                i += 2
                current = [(x, y)]
        elif op == 2:  # LineTo
            for _ in range(count):
                x += _unzigzag(commands[i])
                y += _unzigzag(commands[i + 1])
                i += 2
                current.append((x, y))
        elif op == 7:  # ClosePath
            if current:
                parts.append(current)
                current = []
        else:
            raise ValueError(f"unknown geometry op {op}")
    if current:
        parts.append(current)
    return parts


def encode_geometry(parts, geom_type: int):
    """Inverse of decode_geometry (relative zigzag command stream)."""
    out = []
    x = y = 0
    for part in parts:
        out.append((1 << 3) | 1)  # MoveTo x1
        dx, dy = part[0][0] - x, part[0][1] - y
        out += [_zigzag(dx), _zigzag(dy)]
        x, y = part[0]
        rest = part[1:]
        if rest:
            out.append((len(rest) << 3) | 2)  # LineTo xN
            for px, py in rest:
                out += [_zigzag(px - x), _zigzag(py - y)]
                x, y = px, py
        if geom_type == GEOM_POLYGON:
            out.append((1 << 3) | 7)  # ClosePath
    return out


# ---- feature / layer / tile ------------------------------------------


def _decode_feature(buf: bytes, keys, values):
    feat = {"id": None, "type": GEOM_UNKNOWN, "properties": {}, "geometry": []}
    tags = []
    geom = []
    for field, wire, value in _fields(buf):
        if field == 1:
            feat["id"] = value
        elif field == 2:
            if wire == 2:  # packed
                pos = 0
                while pos < len(value):
                    v, pos = _read_varint(value, pos)
                    tags.append(v)
            else:
                tags.append(value)
        elif field == 3:
            feat["type"] = value
        elif field == 4:
            if wire == 2:
                pos = 0
                while pos < len(value):
                    v, pos = _read_varint(value, pos)
                    geom.append(v)
            else:
                geom.append(value)
    for i in range(0, len(tags) - 1, 2):
        feat["properties"][keys[tags[i]]] = values[tags[i + 1]]
    feat["geometry"] = decode_geometry(geom, feat["type"])
    return feat


def decode_layer(buf: bytes):
    layer = {"name": "", "version": 1, "extent": 4096, "features": []}
    keys, values, raw_features = [], [], []
    for field, _wire, value in _fields(buf):
        if field == 15:
            layer["version"] = value
        elif field == 1:
            layer["name"] = value.decode("utf-8")
        elif field == 2:
            raw_features.append(value)
        elif field == 3:
            keys.append(value.decode("utf-8"))
        elif field == 4:
            values.append(_decode_value(value))
        elif field == 5:
            layer["extent"] = value
    layer["features"] = [_decode_feature(f, keys, values) for f in raw_features]
    return layer


def decode_tile(data: bytes):
    """bytes -> {"layers": [layer, ...]} (layer order preserved)."""
    layers = []
    for field, _wire, value in _fields(data):
        if field == 3:
            layers.append(decode_layer(value))
    return {"layers": layers}


def _encode_feature(feat, key_index, value_index, keys, values) -> bytes:
    out = bytearray()
    if feat.get("id") is not None:
        _write_field(out, 1, 0, feat["id"])
    tags = []
    for k, v in feat.get("properties", {}).items():
        if k not in key_index:
            key_index[k] = len(keys)
            keys.append(k)
        vk = (type(v).__name__, v)
        if vk not in value_index:
            value_index[vk] = len(values)
            values.append(v)
        tags += [key_index[k], value_index[vk]]
    if tags:
        packed = bytearray()
        for t in tags:
            _write_varint(packed, t)
        _write_field(out, 2, 2, bytes(packed))
    _write_field(out, 3, 0, feat.get("type", GEOM_UNKNOWN))
    geom = encode_geometry(feat.get("geometry", []), feat.get("type", GEOM_UNKNOWN))
    packed = bytearray()
    for g in geom:
        _write_varint(packed, g)
    _write_field(out, 4, 2, bytes(packed))
    return bytes(out)


def encode_layer(layer) -> bytes:
    out = bytearray()
    _write_field(out, 15, 0, layer.get("version", 2))
    _write_field(out, 1, 2, layer["name"].encode("utf-8"))
    keys, values = [], []
    key_index, value_index = {}, {}
    feature_bufs = [
        _encode_feature(f, key_index, value_index, keys, values)
        for f in layer.get("features", [])
    ]
    for fb in feature_bufs:
        _write_field(out, 2, 2, fb)
    for k in keys:
        _write_field(out, 3, 2, k.encode("utf-8"))
    for v in values:
        _write_field(out, 4, 2, _encode_value(v))
    _write_field(out, 5, 0, layer.get("extent", 4096))
    return bytes(out)


def encode_tile(tile) -> bytes:
    out = bytearray()
    for layer in tile["layers"]:
        _write_field(out, 3, 2, encode_layer(layer))
    return bytes(out)


def merge_tiles(tiles) -> dict:
    """Concatenate same-named layers across tiles, deterministic layer
    order = sorted by name (from_merged_vector.rs:57-69; the
    reference's HashMap order is unspecified — ours is the contract)."""
    by_name = {}
    for tile in tiles:
        for layer in tile["layers"]:
            tgt = by_name.setdefault(
                layer["name"],
                {"name": layer["name"], "version": layer.get("version", 2),
                 "extent": layer.get("extent", 4096), "features": []},
            )
            tgt["features"] = tgt["features"] + list(layer["features"])
    return {"layers": [by_name[n] for n in sorted(by_name)]}
