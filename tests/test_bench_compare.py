"""tools/bench_compare: baseline loading must survive the driver's
truncation failure mode (BENCH_r10.json: {"parsed": null, "tail":
"<last N bytes of stdout>"}), and bench.py's fallback walk depends on
the loader raising ValueError — not SystemExit, which killed the r11
bench run before it printed its JSON line — when nothing is
recoverable."""

from __future__ import annotations

import json

import pytest

from tools.bench_compare import classify, load


def _write(tmp_path, name: str, obj) -> str:
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_plain_and_parsed_wrapper(tmp_path):
    plain = {"queries": {"q1": 1.0}, "value": 1.0}
    assert load(_write(tmp_path, "a.json", plain))["queries"] == {"q1": 1.0}
    wrapped = {"n": 1, "parsed": plain}
    assert load(_write(tmp_path, "b.json", wrapped))["queries"] == {"q1": 1.0}


def test_load_recovers_from_truncated_tail(tmp_path):
    # mid-key truncation: the partial first key must NOT be attributed
    # to any query; compare-block old_sec/new_sec must not leak in
    tail = (
        'm_lsh_candidate_pairs": 1.254, "llm_cosine_topk": 0.529, '
        '"tpch_q1": 0.617}, "sf": 0.1, "compare_to_prev": {"vs": "x", '
        '"outside_band": [{"query": "q", "old_sec": 9.9, "new_sec": 8.8}]}}'
    )
    d = load(_write(tmp_path, "t.json", {"n": 1, "parsed": None, "tail": tail}))
    assert d["recovered_from_tail"] is True
    assert d["queries"] == {"llm_cosine_topk": 0.529, "tpch_q1": 0.617}


def test_load_raises_value_error_when_unrecoverable(tmp_path):
    with pytest.raises(ValueError):
        load(_write(tmp_path, "u.json", {"n": 1, "parsed": None, "tail": "==>"}))
    with pytest.raises(ValueError):
        load(_write(tmp_path, "v.json", {"n": 1}))


def test_classify_flags_recovered_baseline():
    old = {"queries": {"q1": 1.0, "q2": 2.0}, "recovered_from_tail": True}
    new = {"queries": {"q1": 1.05, "q2": 2.1, "q3": 0.5}}
    c = classify(old, new)
    assert c["baseline_recovered_from_tail"] is True
    assert c["shared"] == 2
    assert c["added"] == ["q3"]
    # a clean baseline must not carry the flag at all
    assert "baseline_recovered_from_tail" not in classify({"queries": {"q1": 1.0}}, new)
