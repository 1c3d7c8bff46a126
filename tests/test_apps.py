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
    assert all(p["new_tokens"] == 16 for p in profiles)
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


class FakeChatTokenizer:
    """Minimal chat-template tokenizer for harness tests (vocab = bytes)."""

    eos_token_id = 0

    def apply_chat_template(self, messages, tokenize=False, add_generation_prompt=True):
        parts = [f"<|{m['role']}|>{m['content']}<|end|>" for m in messages]
        if add_generation_prompt:
            parts.append("<|assistant|>")
        text = "".join(parts)
        return self.encode(text) if tokenize else text

    def encode(self, text):
        return [1 + (b % 255) for b in text.encode()][:64]

    def decode(self, ids):
        return "".join(chr(96 + (t % 26)) for t in ids)


def test_bench_generate_humaneval_format(tmp_path):
    """Chat-template prompt construction + reference record/CSV schema."""
    args = bench_generate.make_parser().parse_args([])
    args.strategy = "jacobi"
    args.n_token_seq_len = 8
    args.max_blocks = 1
    args.max_new_tokens = 16
    args.dataset = os.path.join(os.path.dirname(__file__), "data", "humaneval_smoke.jsonl")
    args.dataset_format = "humaneval"
    args.output_dir = str(tmp_path)
    tok = FakeChatTokenizer()
    agg, profiles = bench_generate.run(args, engine=make_engine(), tokenizer=tok)
    assert agg["n_examples"] == 3
    # reference CSV schema (jacobi_forcing_inference_humaneval.py:203-219)
    rows = list(csv.DictReader(open(tmp_path / "profile_jacobi.csv")))
    for col in ("index", "task_id", "prompt_tokens", "new_tokens", "calls",
                "total_iterations", "avg_iter_per_call", "avg_iter_per_token",
                "time_sec", "toks_per_sec", "stop_reason"):
        assert col in rows[0], col
    assert rows[0]["task_id"] == "Smoke/0"
    assert rows[0]["stop_reason"] in ("eos", "max_new_tokens", "max_iterations")
    # evalchemy-style generations: raw output + extracted generation
    gens = [json.loads(l) for l in open(tmp_path / "generations_jacobi.jsonl")]
    assert all("output" in g and "generation" in g for g in gens)


def test_extract_python_code():
    fenced = "intro\n```python\ndef f():\n    return 1\n```\ntail"
    assert bench_generate.extract_python_code(fenced) == "def f():\n    return 1"
    assert bench_generate.extract_python_code("no block") == "no block"


def test_build_prompt_ids_templates():
    tok = FakeChatTokenizer()
    he = bench_generate.build_prompt_ids(
        {"prompt": "def f():\n    pass"}, "humaneval", tok
    )
    assert isinstance(he, list) and he
    # template text must wrap the code in the reference's instruction
    text = bench_generate.HUMANEVAL_TEMPLATE.format("x")
    assert "do the completion only" in text and "```python" in text
    m5 = bench_generate.build_prompt_ids({"problem": "1+1=?"}, "math500", tok)
    assert isinstance(m5, list) and m5
    assert "Alibaba Cloud" in bench_generate.QWEN_SYSTEM


def test_chat_web_streams(tmp_path):
    """Browser chat UI: page serves, /generate streams ndjson token events,
    streamed text equals blocking generation (reference Streamlit app parity,
    applications/jacobi_model_chat.py)."""
    import threading
    import urllib.request

    from jacobiforcing_tpu.apps import chat_web

    tok = FakeChatTokenizer()
    eng = make_engine(jacobi_chunk_tokens=8)
    server = chat_web.serve(
        eng, tok, port=0,
        default_params={"jacobi_block_len": 8, "jacobi_max_blocks": 1,
                        "max_tokens": 16},
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30
        ).read().decode()
        assert "JacobiForcing-TPU chat" in page
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": "hello world", "max_tokens": 16}).encode(),
            headers={"Content-Type": "application/json"},
        )
        events = []
        with urllib.request.urlopen(req, timeout=120) as resp:
            for line in resp:
                line = line.strip()
                if line:
                    events.append(json.loads(line))
        text = "".join(e.get("text", "") for e in events if e["pane"] == "jacobi")
        stats = [e for e in events if "stats" in e]
        assert stats and "tok/s" in stats[0]["stats"]

        # oracle: blocking generation on a fresh identical engine
        from jacobiforcing_tpu.config import SamplingParams

        ids = tok.apply_chat_template(
            [{"role": "user", "content": "hello world"}],
            tokenize=True, add_generation_prompt=True,
        )
        want = make_engine().generate(
            [ids],
            SamplingParams(temperature=0.0, max_tokens=16,
                           decode_strategy="jacobi", jacobi_block_len=8,
                           jacobi_max_blocks=1, jacobi_max_iterations=4096),
        )[0]["token_ids"]
        assert text == tok.decode(want)
    finally:
        server.shutdown()


def test_bench_schema_matches_golden(tmp_path):
    """Pin the bench driver's CSV / generations-JSONL / summary-JSON schemas
    against a golden file (tests/data/golden_bench_schema.json) so silent
    schema drift fails loudly.  The CSV column set mirrors the reference's
    per-example profile (jacobi_forcing_inference_humaneval.py:203-219 writes
    the same quantities); evalchemy consumers parse the JSONL keys."""
    golden = json.load(
        open(os.path.join(os.path.dirname(__file__), "data",
                          "golden_bench_schema.json"))
    )

    args = bench_generate.make_parser().parse_args([])
    args.strategy = "jacobi"
    args.n_token_seq_len = 8
    args.max_blocks = 1
    args.max_new_tokens = 16
    args.output_dir = str(tmp_path)
    args.limit = 2
    args.synthetic_prompt_len = 12
    agg, _ = bench_generate.run(args, engine=make_engine(), tokenizer=None)

    with open(tmp_path / "profile_jacobi.csv") as f:
        header = f.readline().strip().split(",")
    assert header == golden["profile_csv_columns"]

    gens = [json.loads(l) for l in open(tmp_path / "generations_jacobi.jsonl")]
    for g in gens:
        assert list(g.keys()) == golden["generations_keys_no_tokenizer"]

    summary = json.load(open(tmp_path / "summary_jacobi.json"))
    assert list(summary.keys()) == golden["summary_keys"]
    assert list(agg.keys()) == golden["summary_keys"]

    # tokenizer path adds the evalchemy text fields in a pinned order
    tok = FakeChatTokenizer()
    args.output_dir = str(tmp_path / "tok")
    args.dataset_format = "humaneval"
    args.dataset = os.path.join(
        os.path.dirname(__file__), "data", "humaneval_smoke.jsonl"
    )
    bench_generate.run(args, engine=make_engine(), tokenizer=tok)
    gens = [
        json.loads(l)
        for l in open(tmp_path / "tok" / "generations_jacobi.jsonl")
    ]
    for g in gens:
        assert list(g.keys()) == golden["generations_keys_with_tokenizer"]


def test_engine_bench_smoke():
    """run_engine_bench end to end on a tiny model: continuous batching with
    backfill, steady-state windowing, and the metric schema bench.py embeds."""
    import jax

    from jacobiforcing_tpu.apps.bench_engine import run_engine_bench
    from jacobiforcing_tpu.models.qwen import ModelConfig, init_params

    mc = ModelConfig.tiny(vocab_size=128)
    params = init_params(mc, jax.random.PRNGKey(0))
    out = run_engine_bench(
        B=2, prompt_len=24, max_tokens=16, L=8, chunk_iters=4, requests=5,
        max_model_len=128, chunk_tokens=16, model_cfg=mc, params=params,
    )
    assert out["metric"] == "engine_tps_at_tpf4_64h2L_B2_L8"
    for k in ("value", "steady_iters_per_s", "steady_occupancy",
              "ms_per_forward", "batch_occupancy", "committed_tok_per_s"):
        assert out[k] > 0, (k, out)
    assert out["requests"] == 5


def test_countdown_task_truth_matches_generator():
    """The round-5 demo task's generator and the quant probe's deterministic
    ground truth must agree: for every generated row, the continuation after
    the prompt IS task_truth(prompt) — phase-unambiguous and EOS-terminated."""
    import sys

    import numpy as np

    from jacobiforcing_tpu.apps.train_tpf_demo import (
        CD_BASE, EOS_ID, countdown_copy_row,
    )

    sys.path.insert(0, "scripts")
    from probe_quant_acceptance import task_truth

    rng = np.random.RandomState(7)
    for _ in range(50):
        prompt, seq = countdown_copy_row(rng, 256)
        cont = seq[len(prompt):]
        assert cont == task_truth(prompt, "countdown", len(cont))
        assert cont[-1] == EOS_ID and EOS_ID not in cont[:-1]
        m = prompt[0] - CD_BASE
        assert 3 <= m <= 6
        # every cycle starts with its countdown marker: phase is locally
        # unambiguous (the round-4 slow-tail fix)
        n = len(prompt) - 1
        for k in range(m - 1, 0, -1):
            off = (m - 1 - k) * (n + 1)
            assert cont[off] == CD_BASE + k
            assert cont[off + 1 : off + 1 + n] == prompt[1:]
