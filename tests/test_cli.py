"""CLI surface: convert / probe / vpl / pyramid end-to-end in
subprocesses (each owns its own Ray session)."""

import json
import subprocess
import sys


def _run(args):
    out = subprocess.run(
        [sys.executable, "-m", "versatiles_rs_ray", "--num-cpus", "4", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_vpl_convert_probe(tmp_path):
    src = str(tmp_path / "src.mbtiles")
    doc = _run(["vpl", "from_debug zmax=3", src])
    assert doc["written"] == 1 + 4 + 16 + 64

    dst = str(tmp_path / "out.tar")
    doc = _run(
        ["convert", src, dst, "--bbox", "0,0,40,20", "--max-zoom", "3", "--flip-y"]
    )
    assert doc["written"] == 4  # filter golden tiles z0..3

    probe = _run(["probe", dst])
    assert probe["total_tiles"] == 4
    zs = {l["z"]: l for l in probe["levels"]}
    # z3 golden tile (3,4,3) flipped -> y = 7-3 = 4
    assert (zs[3]["x_min"], zs[3]["y_min"]) == (4, 4)


def test_cli_pyramid(tmp_path):
    out = str(tmp_path / "pyr")
    doc = _run(["pyramid", "/root/testdata/sf0.001", out, "--z-base", "4"])
    assert doc["z=0"] == 1  # one root tile row
    assert len(doc) == 5
