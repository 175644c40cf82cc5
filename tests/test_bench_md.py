"""BENCH.md must agree with the persisted bench records.

``bench.py check_md()`` recomputes every current-round headline
number (suite total, query count, throughput, slowest query, the
three scaling efficiencies and their per-level throughputs) from
``BENCH*.json`` and reports any claim the prose no longer supports —
the automated guard for the round-4 record-integrity class of bug.
Intentional changes land by rerunning bench (updating the JSONs)
before editing the prose.
"""

import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_md_matches_records():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    problems = bench.check_md()
    assert problems == [], "\n".join(problems)
