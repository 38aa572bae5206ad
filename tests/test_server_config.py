"""YAML server-config surface (versatiles/src/config/main.rs) parsed
against the reference's own config1.yml, plus an end-to-end server run
with CORS, extra headers, the REAL static.tar.br, and a VPL tile
source."""

import json
import urllib.error
import urllib.request

import pytest

from versatiles_rs_ray.config import load_server_config, server_from_config

CONFIG1 = "/root/reference/testdata/config1.yml"


def test_parse_reference_config1():
    cfg = load_server_config(CONFIG1)
    assert cfg["server"] == {"ip": "127.0.0.1", "port": 51234,
                             "minimal_recompression": True, "disable_api": True}
    assert cfg["cors"]["allowed_origins"] == ["https://example.org",
                                              "*.other-example.org"]
    assert cfg["cors"]["max_age_seconds"] == 86400
    h = cfg["extra_response_headers"]
    assert h["Cache-Control"] == "public, max-age=86400, immutable"
    assert h["Surrogate-Control"] == "max-age=604800"
    assert h["CDN-Cache-Control"] == "max-age=604800"
    assert h["Timing-Allow-Origin"] == "*"
    # relative paths resolve against the config file's dir
    statics = {s["url_prefix"]: s["path"] for s in cfg["static"]}
    assert statics["/"] == "/root/reference/testdata/static.tar.br"
    assert statics["/whynot/"] == "/root/reference/testdata/static.tar.gz"
    assert statics["/assets"] == "/root/reference/testdata"
    tiles = {t["name"]: t["path"] for t in cfg["tiles"]}
    assert tiles["osm"] == "https://download.versatiles.org/osm.versatiles"
    assert tiles["berlin"] == "/root/reference/testdata/berlin.mbtiles"
    assert tiles["pipeline"] == "/root/reference/testdata/berlin.vpl"


def test_name_defaults_to_stem(tmp_path):
    (tmp_path / "c.yml").write_text(
        "tiles:\n  - path: ./world.pmtiles\n")
    cfg = load_server_config(str(tmp_path / "c.yml"))
    assert cfg["tiles"][0]["name"] == "world"


@pytest.fixture()
def cfg_server(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.sources.tiles_io import write_mbtiles

    ds = rd.from_arrow(pa.table({
        "z": pa.array([0], pa.int64()), "x": pa.array([0], pa.int64()),
        "y": pa.array([0], pa.int64()),
        "payload": pa.array([b'{"hello": 1}'], pa.binary())}))
    write_mbtiles(ds, str(tmp_path / "t.mbtiles"))
    (tmp_path / "p.vpl").write_text('from_debug zmax="1"\n')
    (tmp_path / "srv.yml").write_text(f"""
server:
  ip: 127.0.0.1
  port: 0
cors:
  allowed_origins:
    - "https://example.org"
    - "*.other-example.org"
  max_age_seconds: 86400
extra_response_headers:
  Cache-Control: "public, max-age=86400, immutable"
  X-Test: "yes"
static:
  - path: /root/reference/testdata/static.tar.br
    url_prefix: /
tiles:
  - name: t
    path: ./t.mbtiles
  - name: pipe
    path: ./p.vpl
""")
    srv = server_from_config(str(tmp_path / "srv.yml"))
    url = srv.start()
    yield url
    srv.shutdown()


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    return urllib.request.urlopen(req, timeout=10)


def test_config_server_end_to_end(cfg_server):
    url = cfg_server
    # extra headers on every response; CORS echoes allowed origins only
    r = _get(f"{url}/status", {"Origin": "https://example.org"})
    assert r.read() == b"ready!"
    assert r.headers["Cache-Control"] == "public, max-age=86400, immutable"
    assert r.headers["X-Test"] == "yes"
    assert r.headers["Access-Control-Allow-Origin"] == "https://example.org"
    r = _get(f"{url}/status", {"Origin": "https://sub.other-example.org"})
    assert r.headers["Access-Control-Allow-Origin"] == "https://sub.other-example.org"
    r = _get(f"{url}/status", {"Origin": "https://evil.example"})
    assert r.headers["Access-Control-Allow-Origin"] is None
    # preflight
    req = urllib.request.Request(f"{url}/status", method="OPTIONS",
                                 headers={"Origin": "https://example.org"})
    r = urllib.request.urlopen(req, timeout=10)
    assert r.status == 204
    assert r.headers["Access-Control-Max-Age"] == "86400"
    # REAL static.tar.br served at /
    r = _get(f"{url}/index.html")
    assert b"<html>" in r.read()
    # mbtiles tile source
    r = _get(f"{url}/tiles/t/0/0/0")
    assert json.loads(r.read()) == {"hello": 1}
    # VPL pipeline source materialized and served
    r = _get(f"{url}/tiles/pipe/1/0/1")
    assert json.loads(r.read()) == {"x": 0, "y": 1, "z": 1}
    # index lists both
    r = _get(f"{url}/tiles/index.json")
    assert json.loads(r.read()) == ["pipe", "t"]


def test_unreachable_sources(tmp_path):
    (tmp_path / "bad.yml").write_text(
        "tiles:\n  - name: nope\n    path: ./missing.mbtiles\n")
    with pytest.raises(Exception):
        server_from_config(str(tmp_path / "bad.yml"))
    srv = server_from_config(str(tmp_path / "bad.yml"), skip_unreachable=True)
    assert srv.sources == {}


def test_head_requests(cfg_server):
    # HEAD answers like GET with no body (the reference's axum router
    # handles HEAD implicitly)
    req = urllib.request.Request(f"{cfg_server}/status", method="HEAD")
    r = urllib.request.urlopen(req, timeout=10)
    assert r.status == 200
    assert r.headers["Content-Length"] == "6"  # b"ready!"
    assert r.headers["X-Test"] == "yes"
    assert r.read() == b""
    req = urllib.request.Request(f"{cfg_server}/tiles/t/0/0/0", method="HEAD")
    r = urllib.request.urlopen(req, timeout=10)
    assert r.status == 200 and r.read() == b""


def test_disable_api_and_recompression(tmp_path, ray_session):
    import gzip as _gz

    import pyarrow as pa
    import ray.data as rd

    from versatiles_rs_ray.sources.tiles_io import write_mbtiles

    ds = rd.from_arrow(pa.table({
        "z": pa.array([0], pa.int64()), "x": pa.array([0], pa.int64()),
        "y": pa.array([0], pa.int64()),
        "payload": pa.array([b'{"hello": 1}'], pa.binary())}))
    write_mbtiles(ds, str(tmp_path / "t.mbtiles"))
    (tmp_path / "api_off.yml").write_text(f"""
server:
  ip: 127.0.0.1
  port: 0
  disable_api: true
tiles:
  - name: t
    path: {tmp_path}/t.mbtiles
""")
    srv = server_from_config(str(tmp_path / "api_off.yml"))
    url = srv.start()
    try:
        # API endpoints 404 (server.rs:58 disable_api)
        for ep in ("/tiles/index.json", "/tiles/t/tiles.json"):
            try:
                _get(f"{url}{ep}")
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        # tiles still served; identity client untouched
        assert json.loads(_get(f"{url}/tiles/t/0/0/0").read()) == {"hello": 1}
        # config default minimal_recompression=false -> gzip for
        # accepting clients (server.rs:52 best-accepted-encoding)
        r = _get(f"{url}/tiles/t/0/0/0", {"Accept-Encoding": "gzip"})
        assert r.headers["Content-Encoding"] == "gzip"
        assert json.loads(_gz.decompress(r.read())) == {"hello": 1}
    finally:
        srv.shutdown()
