#!/usr/bin/env python3
"""Independent Mapbox-Vector-Tile decoder (pure python, written straight
from the protobuf wire format + vector_tile.proto of the public MVT v2.1
spec — no shared code with the Scala encoder).

Usage: decode_mvt.py <tile.mvt> [...]        # prints layer + feature rows
       decode_mvt.py --tree <dir>            # decode every {z}/{x}/{y}.mvt

Output: one CSV line per feature: file,layer,extent,version,x,y,users,trips
Exit 1 if any tile fails structural checks (version==2, extent>0, POINT
geometry, known attribute keys).
"""
import sys
from pathlib import Path


def varint(buf, pos):
    shift = v = 0
    while True:
        b = buf[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos


def unzigzag(v):
    return (v >> 1) ^ -(v & 1)


def fields(buf, start, end):
    pos = start
    while pos < end:
        tag, pos = varint(buf, pos)
        fnum, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = varint(buf, pos)
            yield fnum, v
        elif wire == 2:
            ln, pos = varint(buf, pos)
            yield fnum, buf[pos:pos + ln]
            pos += ln
        elif wire == 5:
            yield fnum, buf[pos:pos + 4]
            pos += 4
        elif wire == 1:
            yield fnum, buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"wire type {wire}")


def decode_value(buf):
    for fnum, v in fields(buf, 0, len(buf)):
        if fnum in (4, 5, 6):  # int / uint / sint value
            return v if fnum != 6 else unzigzag(v)
        if fnum == 1:
            return v.decode("utf-8")
    return None


def decode_tile(path):
    buf = Path(path).read_bytes()
    rows, ok = [], True
    for fnum, layer in fields(buf, 0, len(buf)):
        if fnum != 3:
            continue
        name, version, extent = None, None, 4096
        keys, values, feats = [], [], []
        for lf, lv in fields(layer, 0, len(layer)):
            if lf == 1:
                name = lv.decode("utf-8")
            elif lf == 15:
                version = lv
            elif lf == 5:
                extent = lv
            elif lf == 3:
                keys.append(lv.decode("utf-8"))
            elif lf == 4:
                values.append(decode_value(lv))
            elif lf == 2:
                feats.append(lv)
        for f in feats:
            tags, geom, gtype = [], [], None
            for ff, fv in fields(f, 0, len(f)):
                if ff == 2:
                    p = 0
                    while p < len(fv):
                        v, p = varint(fv, p)
                        tags.append(v)
                elif ff == 3:
                    gtype = fv
                elif ff == 4:
                    p = 0
                    while p < len(fv):
                        v, p = varint(fv, p)
                        geom.append(v)
            if gtype != 1:
                print(f"BAD geom type {gtype} in {path}", file=sys.stderr)
                ok = False
                continue
            cmd = geom[0]
            if cmd >> 3 != 1 or (cmd & 7) != 1:
                print(f"BAD MoveTo {cmd:#x} in {path}", file=sys.stderr)
                ok = False
            x, y = unzigzag(geom[1]), unzigzag(geom[2])
            attrs = {}
            for ki, vi in zip(tags[::2], tags[1::2]):
                attrs[keys[ki]] = values[vi]
            rows.append((name, extent, version, x, y,
                         attrs.get("users"), attrs.get("trips")))
        if version != 2 or not name or extent <= 0:
            print(f"BAD layer header in {path}", file=sys.stderr)
            ok = False
    return rows, ok


def main():
    args = sys.argv[1:]
    if args and args[0] == "--tree":
        files = sorted(Path(args[1]).rglob("*.mvt"))
    else:
        files = [Path(a) for a in args]
    all_ok = True
    n = 0
    for f in files:
        rows, ok = decode_tile(f)
        all_ok &= ok and len(rows) > 0
        for (layer, extent, version, x, y, users, trips) in rows:
            print(f"{f},{layer},{extent},{version},{x},{y},{users},{trips}")
            n += 1
    print(f"# {len(files)} tiles, {n} features, ok={all_ok}", file=sys.stderr)
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
