"""bench.py real-corpus mode (--ndjson/--queries) at fixture scale:
the one-command run for the day the real Wikipedia/AOL files appear
(round-4 verdict item 8; reference inputs README.md:273-274)."""

import json
import os
import subprocess
import sys

import numpy as np


def test_bench_ndjson_mode(tmp_path):
    rng = np.random.default_rng(5)
    vocab = [f"w{i:03d}" for i in range(60)]
    nd = tmp_path / "corpus.ndjson"
    with open(nd, "w") as f:
        for _ in range(400):
            f.write(json.dumps({
                "title": " ".join(rng.choice(vocab, 3)),
                "text": " ".join(rng.choice(vocab, 10)),
            }) + "\n")
    qf = tmp_path / "queries.txt"
    qf.write_text("\n".join(
        f"{rng.choice(vocab)} {rng.choice(vocab)}" for _ in range(32)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    out = subprocess.run(
        [sys.executable, "bench.py", "--ndjson", str(nd),
         "--queries", str(qf), "--batch", "16", "--iters", "1",
         "--passes", "1", "--threads", "2",
         "--index-dir", str(tmp_path / "bix")],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["docs"] == 400
    assert rec["value"] > 0
    assert "b1_p50_us" in rec
