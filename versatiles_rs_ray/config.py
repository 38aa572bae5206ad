"""Server YAML configuration — the reference's `versatiles serve -c`
surface (versatiles/src/config/main.rs: Config{server, cors,
extra_response_headers, static_sources, tile_sources}).

`load_server_config` parses + normalizes (defaults from server.rs /
cors.rs; relative paths resolve against the config file's directory,
like the reference's DataLocation). `server_from_config` builds a
ready-to-start TileServer. A `.vpl` tile source is converted ONCE at
mount time to a PMTiles archive (distributed write) and served by
random access — the reference instead evaluates VPL per request
through its async runtime, which has no analogue in a
Ray-Dataset-per-request model.
"""

from __future__ import annotations

import os


def load_server_config(path: str) -> dict:
    """YAML -> normalized config dict with reference defaults applied."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    base = os.path.dirname(os.path.abspath(path))

    def resolve(p: str) -> str:
        p = str(p)
        if "://" in p or os.path.isabs(p):
            return p
        return os.path.normpath(os.path.join(base, p))

    server = raw.get("server") or {}
    cfg = {
        "server": {
            # server.rs defaults: 0.0.0.0:8080 when unset
            "ip": str(server.get("ip", "0.0.0.0")),
            "port": int(server.get("port", 8080)),
            "minimal_recompression": bool(server.get("minimal_recompression", False)),
            "disable_api": bool(server.get("disable_api", False)),
        },
        "cors": None,
        "extra_response_headers": {
            str(k): str(v)
            for k, v in (raw.get("extra_response_headers") or {}).items()
        },
        "static": [],
        "tiles": [],
    }
    cors = raw.get("cors")
    if cors:
        cfg["cors"] = {
            "allowed_origins": [str(o) for o in cors.get("allowed_origins") or []],
            "max_age_seconds": cors.get("max_age_seconds"),
        }
    for s in raw.get("static") or []:
        cfg["static"].append({
            "path": resolve(s["path"]),
            "url_prefix": str(s.get("url_prefix", "/")),
        })
    for t in raw.get("tiles") or []:
        p = resolve(t["path"])
        name = t.get("name")
        if not name:  # tile_source.rs: name defaults to the file STEM
            # (last-dot split, like Path::file_stem and cmd_serve)
            name = os.path.basename(p).rsplit(".", 1)[0]
        cfg["tiles"].append({"name": str(name), "path": p})
    return cfg


def server_from_config(path: str, *, skip_unreachable: bool = False):
    """Build a TileServer from a YAML config file.

    skip_unreachable: mount what can be opened and skip (with a
    warning) sources that cannot — useful when a config references
    remote URLs in an offline environment; the reference instead fails
    startup, so the default here is also to raise.
    """
    from .server import TileServer

    cfg = load_server_config(path)
    srv = TileServer(
        host=cfg["server"]["ip"],
        port=cfg["server"]["port"],
        extra_response_headers=cfg["extra_response_headers"],
        cors=cfg["cors"],
        disable_api=cfg["server"]["disable_api"],
        minimal_recompression=cfg["server"]["minimal_recompression"],
    )
    for t in cfg["tiles"]:
        try:
            if t["path"].endswith(".vpl"):
                _mount_vpl(srv, t["name"], t["path"])
            else:
                srv.add_tile_source(t["name"], t["path"])
        except Exception:
            if not skip_unreachable:
                raise
            import sys

            print(f"warning: skipping unreachable tile source "
                  f"{t['name']!r} ({t['path']})", file=sys.stderr)
    for s in cfg["static"]:
        srv.add_static_source(s["path"], s["url_prefix"])
    return srv


def _mount_vpl(srv, name: str, vpl_path: str):
    """Mount a VPL pipeline by converting it to a PMTiles archive at
    mount time and serving via the random-access reader
    (container_registry.rs:196-246 dispatches .vpl to the pipeline
    reader). The pipeline streams through the distributed writer — no
    driver-side tile dict; serving is per-tile range reads through the
    bounded-cache PMTilesRandomAccess, so a big mounted pipeline costs
    one conversion, not resident RAM."""
    import tempfile

    from .pipelines.vpl import build_pipeline
    from .sources.pmtiles import write_pmtiles

    text = open(vpl_path).read()
    ds = build_pipeline(text, sf_dir=os.path.dirname(os.path.abspath(vpl_path)))
    tmp = tempfile.mkdtemp(prefix="vts_serve_")
    srv._temp_dirs.append(tmp)  # reclaimed in TileServer.shutdown()
    out = os.path.join(tmp, f"{name}.pmtiles")
    write_pmtiles(ds, out, metadata={"name": name})
    srv.add_tile_source(name, out)
