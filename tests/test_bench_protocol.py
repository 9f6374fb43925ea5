"""Bench evidence-protocol invariants (pure Python — no Spark session).

The scaling artifacts are graded evidence; these tests pin the reporting
semantics so a regression can't silently reintroduce the round-3 defect
(a capture FRACTION reported > 1.0 when the ceiling probes sampled a
throttled window the timed runs did not).
"""

from __future__ import annotations

from spider_spark.bench_crawl import ceiling_context


def test_capture_ratio_is_a_fraction():
    out = ceiling_context(0.8, [{"ceiling_efficiency": 0.9}])
    assert out["efficiency_over_machine_ceiling"] == round(0.8 / 0.9, 3)
    assert out["machine_ceiling_best"] == 0.9
    assert "ceiling_probe_throttled_relative_to_run" not in out
    assert "efficiency_over_machine_ceiling_raw" not in out


def test_over_ceiling_is_capped_and_flagged():
    """The round-3 exec-pair shape: eff 0.901 against a best probe of
    0.572 must NOT report 1.575 as the capture fraction."""
    out = ceiling_context(0.901, [{"ceiling_efficiency": 0.556},
                                  {"ceiling_efficiency": 0.572}])
    assert out["efficiency_over_machine_ceiling"] == 1.0
    assert out["efficiency_over_machine_ceiling_raw"] == round(0.901 / 0.572, 3)
    assert out["ceiling_probe_throttled_relative_to_run"] is True


def test_best_probe_across_all_brackets():
    """Pre, post, AND resample probes all bound the ratio — the best
    (least throttled) reading is the honest ceiling."""
    out = ceiling_context(
        0.85,
        [
            {"ceiling_efficiency": 0.60},   # throttled preflight
            {"ceiling_efficiency": 0.91},   # quiet resample window
            {"ceiling_efficiency": 0.70},   # post
        ],
    )
    assert out["machine_ceiling_best"] == 0.91
    assert out["efficiency_over_machine_ceiling"] == round(0.85 / 0.91, 3)
