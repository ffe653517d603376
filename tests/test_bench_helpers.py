"""bench.py input-pinning helpers (no Spark needed): the digest must
pin the EXACT input identity — a regenerated-but-distributionally-
identical table has to surface as a digest change in the bench JSON
(round-4 lesson: a silent regeneration muddied a regression's
attribution)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_input_digest_pins_bytes(tmp_path):
    bench = _bench()
    d = tmp_path / "tbl"
    d.mkdir()
    (d / "part-000.parquet").write_bytes(b"alpha")
    (d / "part-001.parquet").write_bytes(b"beta")
    (d / "_SUCCESS").write_bytes(b"")          # ignored: not .parquet
    (d / "notes.txt").write_bytes(b"ignored")  # ignored: not .parquet
    first = bench.input_digest(str(d))
    assert first == bench.input_digest(str(d))  # deterministic

    (d / "part-001.parquet").write_bytes(b"beta2")
    assert bench.input_digest(str(d)) != first  # content change visible


def test_input_digest_order_independent_of_creation(tmp_path):
    bench = _bench()
    a, b = tmp_path / "a", tmp_path / "b"
    for d, order in ((a, ("p1", "p0")), (b, ("p0", "p1"))):
        d.mkdir()
        for name in order:  # creation order differs; name order decides
            (d / f"part-{name}.parquet").write_bytes(name.encode())
    assert bench.input_digest(str(a)) == bench.input_digest(str(b))


def test_ensure_tokens_never_regenerates(tmp_path):
    """An existing _SUCCESS marker means the table is REUSED verbatim:
    no generation wall time, generated=False, bytes untouched."""
    bench = _bench()
    d = tmp_path / "tbl"
    d.mkdir()
    (d / "_SUCCESS").write_bytes(b"")
    (d / "part-000.parquet").write_bytes(b"pinned")
    sec, generated = bench.ensure_tokens(None, 10, 4, str(d))
    assert sec == 0.0 and generated is False
    assert (d / "part-000.parquet").read_bytes() == b"pinned"
