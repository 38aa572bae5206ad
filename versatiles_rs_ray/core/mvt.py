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

import numpy as np

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


# below this many BYTES/VALUES the scalar loops win: numpy call setup
# (~2-5 us per kernel) dominates tiny per-feature buffers (measured on
# the shortbread fixture: naive full vectorization was 8x SLOWER at
# 11k small features/tile)
_VEC_MIN = 192


def decode_varints(buf: bytes):
    """Decode of a PACKED varint buffer -> uint64 array (or list for
    tiny buffers — both index/iterate the same downstream).

    Large buffers take one numpy pass instead of a per-byte Python
    loop (the round-3 MVT hot spot): terminator bytes (high bit clear)
    delimit groups, each byte contributes its 7 payload bits at
    7*(position-in-group), and one add.reduceat per group sums
    disjoint bit ranges (== bitwise or). Safe through canonical
    10-byte 64-bit varints (final byte <= 0x01, shift 63)."""
    if len(buf) < _VEC_MIN:  # scalar fast path for tiny features
        out = []
        pos = 0
        while pos < len(buf):
            v, pos = _read_varint(buf, pos)
            out.append(v)
        return out
    b = np.frombuffer(buf, dtype=np.uint8)
    ends = (b & 0x80) == 0
    starts = np.flatnonzero(np.r_[True, ends[:-1]])
    if not ends[-1]:
        raise ValueError("truncated varint stream")
    gid = np.zeros(len(b), dtype=np.int64)
    gid[starts[1:]] = 1
    np.cumsum(gid, out=gid)
    pos_in = np.arange(len(b), dtype=np.int64) - starts[gid]
    with np.errstate(over="ignore"):
        payload = (b & np.uint8(0x7F)).astype(np.uint64) << (
            7 * pos_in).astype(np.uint64)
    return np.add.reduceat(payload, starts)


def encode_varints(vals) -> bytes:
    """PACKED varint encode of a non-negative int sequence.

    Large arrays use ragged numpy expansion (same repeat/arange trick
    as the exchange exploders): nbytes per value from the bit length,
    byte j carries bits 7j..7j+6 with the continuation bit set on all
    but the last. Tiny sequences use the scalar loop (see _VEC_MIN)."""
    if len(vals) < _VEC_MIN:  # scalar fast path for tiny features
        out = bytearray()
        for t in vals:
            _write_varint(out, int(t))
        return bytes(out)
    v = np.asarray(vals, dtype=np.uint64)
    nbits = np.zeros(len(v), dtype=np.int64)
    tmp = v.copy()
    nz = tmp > 0
    while nz.any():  # <=10 passes (7 bits per pass)
        nbits[nz] += 7
        tmp >>= np.uint64(7)
        nz = tmp > 0
    nbytes = np.maximum(nbits // 7, 1)
    total = int(nbytes.sum())
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    idx = np.repeat(np.arange(len(v), dtype=np.int64), nbytes)
    pos_in = np.arange(total, dtype=np.int64) - np.repeat(starts, nbytes)
    with np.errstate(over="ignore"):
        chunks = (v[idx] >> (7 * pos_in).astype(np.uint64)) & np.uint64(0x7F)
    last = pos_in == (nbytes[idx] - 1)
    out = chunks.astype(np.uint8)
    out[~last] |= np.uint8(0x80)
    return out.tobytes()


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
    """Geometry command stream -> list of rings/lines of (x, y) int pairs.

    Small streams (the common per-feature case) run the scalar walk;
    large streams walk COMMAND WORDS sequentially (a handful per
    feature) but do the per-VERTEX work — unzigzag + running-sum — in
    one numpy pass over all parameter pairs (the round-3 hot loop)."""
    if len(commands) < _VEC_MIN:
        return _decode_geometry_scalar(commands, geom_type)
    cmds = np.asarray(commands, dtype=np.uint64)
    n = len(cmds)
    # sequential pass over command words only: record each param run
    # and where parts start
    i = 0
    runs = []            # (param_start, n_pairs) in command-word index
    part_breaks = []     # vertex indices where a new part begins
    n_vert = 0
    while i < n:
        cmd = int(cmds[i])
        i += 1
        op, count = cmd & 7, cmd >> 3
        if op == 1:  # MoveTo: each of `count` pairs starts a new part
            runs.append((i, count))
            part_breaks.extend(range(n_vert, n_vert + count))
            n_vert += count
            i += 2 * count
        elif op == 2:  # LineTo
            runs.append((i, count))
            n_vert += count
            i += 2 * count
        elif op == 7:  # ClosePath: flushes the current part, so the
            # NEXT vertex (if any) begins a new one — matching the
            # scalar walk even for non-conforming LineTo-after-Close
            # streams
            part_breaks.append(n_vert)
        else:
            raise ValueError(f"unknown geometry op {op}")
    if not n_vert:
        return []
    # gather all parameter pairs in stream order, one vectorized pass
    take = np.concatenate([
        np.arange(s, s + 2 * c, dtype=np.int64) for s, c in runs if c])
    params = cmds[take].astype(np.int64)
    deltas = (params >> 1) ^ -(params & 1)  # unzigzag
    verts = np.cumsum(deltas.reshape(-1, 2), axis=0)
    # split into parts at the recorded breaks; vertex 0 always starts
    # a part (scalar parity for non-conforming LineTo-first streams),
    # and a trailing ClosePath break == n_vert dedups away
    bounds = sorted(set(part_breaks) | {0, n_vert})
    parts = []
    for s, e in zip(bounds[:-1], bounds[1:]):
        parts.append(list(map(tuple, verts[s:e].tolist())))
    return parts


def _decode_geometry_scalar(commands, geom_type: int):
    if isinstance(commands, np.ndarray):
        commands = commands.tolist()  # python ints: no per-element casts
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


def _encode_geometry_scalar(parts, geom_type: int):
    out = []
    x = y = 0
    for part in parts:
        out.append((1 << 3) | 1)  # MoveTo x1
        out += [_zigzag(part[0][0] - x), _zigzag(part[0][1] - y)]
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


def encode_geometry(parts, geom_type: int):
    """Inverse of decode_geometry (relative zigzag command stream).
    Small geometries (the common per-feature case) use the scalar
    walk; large ones return a uint64 numpy array with per-vertex
    delta/zigzag math vectorized (the loop is over PARTS only)."""
    if not parts:
        return []
    if sum(map(len, parts)) < _VEC_MIN // 2:
        return _encode_geometry_scalar(parts, geom_type)
    lens = np.asarray([len(p) for p in parts], dtype=np.int64)
    flat = np.asarray([xy for p in parts for xy in p],
                      dtype=np.int64).reshape(-1, 2)
    deltas = np.empty_like(flat)
    deltas[0] = flat[0]
    deltas[1:] = flat[1:] - flat[:-1]
    zz = ((deltas << 1) ^ (deltas >> 63)).astype(np.uint64)
    close = geom_type == GEOM_POLYGON
    # upper bound: 2 params/vertex + <=3 command words/part
    out = np.empty(2 * len(flat) + 3 * len(parts), dtype=np.uint64)
    # assemble per part: MoveTo word, 2 params, [LineTo word, params], [Close]
    pos = 0
    vtx = 0
    for plen in lens.tolist():
        out[pos] = (1 << 3) | 1  # MoveTo x1
        out[pos + 1:pos + 3] = zz[vtx]
        pos += 3
        if plen > 1:
            out[pos] = ((plen - 1) << 3) | 2  # LineTo x(plen-1)
            rest = zz[vtx + 1:vtx + plen]
            out[pos + 1:pos + 1 + 2 * (plen - 1)] = rest.reshape(-1)
            pos += 1 + 2 * (plen - 1)
        if close:
            out[pos] = (1 << 3) | 7  # ClosePath
            pos += 1
        vtx += plen
    return out[:pos]


# ---- feature / layer / tile ------------------------------------------


def _decode_feature(buf: bytes, keys, values, raw_geometry: bool = False):
    """raw_geometry=True keeps the packed geometry bytes verbatim in
    ``feat["geometry_raw"]`` (no varint/command decode at all) — the
    fast path for property-only transforms, which re-emit the bytes
    untouched in _encode_feature."""
    feat = {"id": None, "type": GEOM_UNKNOWN, "properties": {}, "geometry": []}
    tags = []
    geom = []
    for field, wire, value in _fields(buf):
        if field == 1:
            feat["id"] = value
        elif field == 2:
            if wire == 2:  # packed; inline loop for tiny buffers
                if len(value) < _VEC_MIN:
                    pos = 0
                    while pos < len(value):
                        v, pos = _read_varint(value, pos)
                        tags.append(v)
                else:
                    tags.extend(decode_varints(value).tolist())
            else:
                tags.append(value)
        elif field == 3:
            feat["type"] = value
        elif field == 4:
            if raw_geometry:
                if wire == 2:
                    geom.append(value)
                else:  # unpacked single varint: repack
                    one = bytearray()
                    _write_varint(one, value)
                    geom.append(bytes(one))
            elif wire == 2:
                geom.append(decode_varints(value))
            else:
                geom.append([value])
    for i in range(0, len(tags) - 1, 2):
        feat["properties"][keys[tags[i]]] = values[tags[i + 1]]
    if raw_geometry:
        del feat["geometry"]
        feat["geometry_raw"] = geom[0] if len(geom) == 1 else b"".join(geom)
        return feat
    if len(geom) == 1:
        cmds = geom[0]
    elif geom:
        cmds = np.concatenate([np.asarray(g, dtype=np.uint64) for g in geom])
    else:
        cmds = []
    feat["geometry"] = decode_geometry(cmds, feat["type"])
    return feat


def decode_layer(buf: bytes, raw_geometry: bool = False):
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
    layer["features"] = [
        _decode_feature(f, keys, values, raw_geometry) for f in raw_features]
    return layer


def decode_tile(data: bytes, raw_geometry: bool = False):
    """bytes -> {"layers": [layer, ...]} (layer order preserved).

    raw_geometry=True skips all geometry decoding — each feature gets
    ``geometry_raw`` (packed command bytes, re-emitted verbatim by
    encode_tile). Use for transforms that only touch properties /
    layer structure; it is ~3x faster each way and keeps foreign
    geometry encodings byte-stable."""
    layers = []
    for field, _wire, value in _fields(data):
        if field == 3:
            layers.append(decode_layer(value, raw_geometry))
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
        for t in tags:  # tags per feature are tiny: inline loop wins
            _write_varint(packed, t)
        _write_field(out, 2, 2, bytes(packed))
    _write_field(out, 3, 0, feat.get("type", GEOM_UNKNOWN))
    raw = feat.get("geometry_raw")
    if raw is not None:  # raw passthrough: bytes verbatim, no re-encode
        _write_field(out, 4, 2, raw)
        return bytes(out)
    geom = encode_geometry(feat.get("geometry", []), feat.get("type", GEOM_UNKNOWN))
    if isinstance(geom, np.ndarray):  # large: vectorized packing
        _write_field(out, 4, 2, encode_varints(geom))
    else:
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


def layer_name(buf: bytes) -> str:
    """Decode ONLY a layer message's name (field 1), skipping over
    feature/key/value bytes by length — no feature decode."""
    for field, _wire, value in _fields(buf):
        if field == 1:
            return value.decode("utf-8")
    return ""


def filter_layers_raw(data: bytes, names, invert: bool = False) -> bytes:
    """vector_filter_layers WITHOUT decoding features: walk only the
    tile's top-level fields, peek each layer's name, and copy kept
    layer bytes verbatim. Keeps a layer iff (name in names) == invert
    (listed layers are DROPPED by default, vector_filter_layers.rs:46).
    O(bytes skipped) instead of a full decode->encode round trip —
    the measured tile-transform fast path (~40x on the shortbread
    fixture; content-identical, and kept layers stay byte-identical
    to the input rather than re-canonicalized)."""
    out = bytearray()
    for field, wire, value in _fields(data):
        if field == 3 and wire == 2:
            if (layer_name(value) in names) == invert:
                _write_field(out, 3, 2, value)
        else:
            _write_field(out, field, wire, value)
    return bytes(out)


def filter_properties_raw(data: bytes, match, invert: bool = False) -> bytes:
    """vector_filter_properties at the WIRE level: per layer, decide
    kept keys by ``match(f"{layer}/{key}") == invert``
    (vector_filter_properties.rs:50-55 semantics), rewrite each
    feature's packed tags field against remapped key/value indices,
    and copy everything else — ids, types, geometry commands, value
    *bytes* — verbatim. No feature dicts, no value decode/re-encode.
    Kept key/value table entries are compacted to first-use order so
    dropped properties release their table bytes (matching the full
    decode->encode path's output content, not its exact byte layout).
    """
    out = bytearray()
    for field, wire, value in _fields(data):
        if field == 3 and wire == 2:
            _write_field(out, 3, 2, _filter_layer_props_raw(value, match, invert))
        else:
            _write_field(out, field, wire, value)
    return bytes(out)


def _filter_layer_props_raw(buf: bytes, match, invert: bool) -> bytes:
    name = ""
    key_raw, val_raw = [], []   # undecoded table entries, wire order
    feats = []                  # raw feature buffers, wire order
    head = []                   # non-(2,3,4) fields to re-emit first
    for field, wire, value in _fields(buf):
        if field == 1:
            name = value.decode("utf-8")
            head.append((field, wire, value))
        elif field == 2:
            feats.append(value)
        elif field == 3:
            key_raw.append(value)
        elif field == 4:
            val_raw.append(value)
        else:
            head.append((field, wire, value))
    keep = [bool(match(f"{name}/{k.decode('utf-8')}")) == invert
            for k in key_raw]
    key_map = {}   # old key idx -> new
    val_map = {}   # old value idx -> new
    out = bytearray()
    for field, wire, value in head:
        _write_field(out, field, wire, value)
    for fbuf in feats:
        # collect tags across ALL field-2 occurrences first (packed or
        # single-varint wire 0 — both legal protobuf) so key/value
        # pairing survives split encodings, then emit one rewritten
        # packed field after the verbatim non-tag fields
        fout = bytearray()
        tags = []
        for field, wire, value in _fields(fbuf):
            if field == 2:
                if wire == 2:
                    pos = 0
                    while pos < len(value):
                        v, pos = _read_varint(value, pos)
                        tags.append(v)
                else:
                    tags.append(value)
            else:
                _write_field(fout, field, wire, value)
        new_tags = []
        for i in range(0, len(tags) - 1, 2):
            k, v = tags[i], tags[i + 1]
            if k < len(keep) and keep[k]:
                nk = key_map.setdefault(k, len(key_map))
                nv = val_map.setdefault(v, len(val_map))
                new_tags += [nk, nv]
        if new_tags:
            packed = bytearray()
            for t in new_tags:
                _write_varint(packed, t)
            _write_field(fout, 2, 2, bytes(packed))
        _write_field(out, 2, 2, bytes(fout))
    for old in key_map:  # dict preserves first-use (= new index) order
        _write_field(out, 3, 2, key_raw[old])
    for old in val_map:
        _write_field(out, 4, 2, val_raw[old])
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
