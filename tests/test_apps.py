"""App-layer tests: benchmark driver outputs, grid search, streaming, profiler."""

import csv
import json
import os

import numpy as np

from jacobiforcing_tpu.apps import bench_generate, grid_search
from jacobiforcing_tpu.apps.chat_stream import jacobi_stream_chat
from jacobiforcing_tpu.config import SamplingParams
from tests.test_engine import make_engine, make_prompts


def test_bench_generate_outputs(tmp_path):
    args = bench_generate.make_parser().parse_args([])
    args.strategy = "jacobi"
    args.n_token_seq_len = 8
    args.max_blocks = 1
    args.max_new_tokens = 16
    args.limit = 3
    args.synthetic_prompt_len = 12
    args.output_dir = str(tmp_path)
    agg, profiles = bench_generate.run(args, engine=make_engine(), tokenizer=None)
    assert agg["n_examples"] == 3
    assert len(profiles) == 3
    assert all(p["num_tokens"] == 16 for p in profiles)
    assert all(p["tokens_per_forward"] >= 1.0 for p in profiles)
    gens = [json.loads(l) for l in open(tmp_path / "generations_jacobi.jsonl")]
    assert len(gens) == 3 and all("token_ids" in g for g in gens)
    rows = list(csv.DictReader(open(tmp_path / "profile_jacobi.csv")))
    assert len(rows) == 3
    assert os.path.exists(tmp_path / "summary_jacobi.json")


def test_grid_search(tmp_path):
    args = grid_search.make_parser().parse_args([])
    args.output_dir = str(tmp_path)
    args.block_sizes = [8]
    args.Ks = [1, 2]
    args.rs = [0.8]
    args.pools = [1]
    args.max_new_tokens = 8
    args.limit = 1
    args.dataset = ""
    results = grid_search.run_grid(args, lambda: (make_engine(), None))
    assert len(results) == 2
    assert all("tokens_per_s" in r for r in results)
    rows = list(csv.DictReader(open(tmp_path / "grid_results.csv")))
    assert len(rows) == 2


def test_stream_chat_matches_blocking():
    prompts = make_prompts(256)[:1]
    blocking = make_engine().generate(
        prompts,
        SamplingParams(temperature=0.0, max_tokens=20, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    eng = make_engine(jacobi_chunk_tokens=8)  # small chunks => several stream events
    chunks = []
    out = jacobi_stream_chat(
        eng, None, [{"role": "user", "content": prompts[0]}],
        max_new_tokens=20, n_token_seq_len=8,
        on_chunk=lambda _t, toks: chunks.append(list(toks)),
    )
    assert out["token_ids"] == blocking[0]["token_ids"]
    assert len(chunks) >= 2  # streamed in multiple chunks
    assert sum(chunks, []) == out["token_ids"]


def test_profiler_report(monkeypatch, capsys):
    from jacobiforcing_tpu.utils import profiling

    monkeypatch.setenv("PROFILE", "1")
    profiling.reset_profiler()
    eng = make_engine()
    eng.generate(
        make_prompts(256)[:2],
        SamplingParams(temperature=0.0, max_tokens=12, decode_strategy="jacobi",
                       jacobi_block_len=8, jacobi_max_blocks=1),
    )
    prof = profiling.get_profiler()
    assert prof is not None
    s = prof.summary()
    assert s["tokens"] >= 24
    assert s["iterations"] >= 1
    assert s["tokens_per_forward"] >= 1.0
    rep = prof.report()
    assert "compiled buckets" in rep and "tokens_per_second" in rep
    profiling.reset_profiler()
