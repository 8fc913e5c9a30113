"""Contract test for the Lance code path (sources/io.py).

``lance`` is not installable in this container, so the branch is
exercised through a fake module + monkeypatched Ray Data entry points:
the test proves the dispatch CONTRACT — ``.lance`` paths route to
``ray.data.read_lance`` / ``Dataset.write_lance`` with the caller's
arguments, everything else stays on parquet — so the branch is executed
code, not a pragma."""

import pyarrow as pa
import ray.data

from go_light_rag_ray.sources import io as table_io


def test_lance_read_write_dispatch(monkeypatch, tmp_path, ray_session):
    calls = {}

    def fake_read_lance(path, columns=None):
        calls["read"] = (path, tuple(columns or ()))
        return ray.data.from_arrow(pa.table({"doc_id": ["d1"], "spans": [[]]}))

    def fake_write_lance(self, path):
        calls["write"] = path

    monkeypatch.setattr(table_io, "HAVE_LANCE", True)
    monkeypatch.setattr(ray.data, "read_lance", fake_read_lance,
                        raising=False)
    monkeypatch.setattr(ray.data.Dataset, "write_lance", fake_write_lance,
                        raising=False)

    ds = table_io.read_documents("/data/docs.lance", columns=["doc_id"])
    assert calls["read"] == ("/data/docs.lance", ("doc_id",))
    assert ds.count() == 1

    table_io.write_table(ds, "/out/graph.lance")
    assert calls["write"] == "/out/graph.lance"

    # non-.lance paths stay on parquet even when lance is "available"
    pq_dir = str(tmp_path / "pq")
    table_io.write_table(
        ray.data.from_arrow(pa.table({"a": [1, 2]})), pq_dir)
    assert "write" in calls and calls["write"] == "/out/graph.lance"
    assert table_io.read_documents(pq_dir).count() == 2


def test_lance_flag_off_routes_parquet(monkeypatch, tmp_path, ray_session):
    # HAVE_LANCE=False must ignore the suffix and use parquet
    monkeypatch.setattr(table_io, "HAVE_LANCE", False)
    out = str(tmp_path / "t.lance")
    table_io.write_table(ray.data.from_arrow(pa.table({"a": [1]})), out)
    assert table_io.read_documents(out).count() == 1   # parquet dir readback
