"""Every example must run clean (examples are executable documentation —
the reference ships 10 teaching programs, SURVEY.md #37)."""
import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))

EXAMPLES = [
    "simple_buffer",
    "file_compress",
    "block_streaming_double_buffer",
    "block_streaming_ring_buffer",
    "block_streaming_line_by_line",
    "streaming_hc_ring_buffer",
    "dictionary_random_access",
    "frame_compress",
    "bench_functions",
    "sharded_batch",
    "turbo_wave_mode",
]


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name, capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)          # examples may write files
    mod = importlib.import_module(name)
    if hasattr(mod, "N"):                # shrink micro-bench workloads
        monkeypatch.setattr(mod, "N", 262144)
    if name == "file_compress":
        p = tmp_path / "sample.bin"
        p.write_bytes(b"example payload " * 4096)
        mod.main(str(p))
    else:
        mod.main()
    out = capsys.readouterr().out
    assert out.strip()                  # ran to completion with output
