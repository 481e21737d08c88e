"""CLI smoke tests (python -m pqvector_tpu ...)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pqvector_tpu.__main__ import main


def make_file(tmp_path):
    path = tmp_path / "c.parquet"
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((100, 8)).astype(np.float32)
    pq.write_table(
        pa.table({"embedding": pa.array(list(vecs), pa.list_(pa.float32()))}), path
    )
    return path


def test_cli_build_info_search(tmp_path, capsys):
    path = make_file(tmp_path)
    assert main(["build", str(path), "--n-clusters", "4"]) == 0
    assert main(["info", str(path)]) == 0
    out = capsys.readouterr().out
    assert "clusters         : 4" in out
    assert main(["search", str(path), "--query-row", "5", "-k", "3", "--nprobe", "4"]) == 0
    out = capsys.readouterr().out
    assert out.splitlines()[0].startswith("5\t0.0")


def test_cli_info_unindexed(tmp_path, capsys):
    path = make_file(tmp_path)
    assert main(["info", str(path)]) == 1
    assert "no pq-vector index" in capsys.readouterr().out


def test_cli_build_new_output(tmp_path):
    path = make_file(tmp_path)
    out_path = tmp_path / "out.parquet"
    assert main(["build", str(path), "--n-clusters", "4", "--output", str(out_path), "--cluster-sorted"]) == 0
    from pqvector_tpu import has_pq_vector_index

    assert has_pq_vector_index(out_path)
    assert not has_pq_vector_index(path)


def test_cli_search_device_mode(tmp_path, capsys):
    path = str(make_file(tmp_path))
    assert main(["build", path, "--n-clusters", "4"]) == 0
    capsys.readouterr()
    host = main([
        "search", path, "--query-row", "2", "-k", "3",
        "--nprobe", "8",
    ])
    host_out = capsys.readouterr().out
    rc = main([
        "search", path, "--query-row", "2", "-k", "3",
        "--nprobe", "8", "--device-mode", "scan",
    ])
    dev_out = capsys.readouterr().out
    assert host == 0 and rc == 0
    host_ids = [line.split("\t")[0] for line in host_out.strip().splitlines()]
    dev_ids = [line.split("\t")[0] for line in dev_out.strip().splitlines()]
    assert dev_ids == host_ids
