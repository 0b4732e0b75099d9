"""Tests for operators.chat — transcript parsing, stats, gates.

The planted-construction parity is pinned by the ``chat_turns`` /
``chat_stats`` oracles; here we pin the parser's hostility contract
(malformed JSON, wrong shapes, missing fields never fail a stage)
and the gate algebra on hand-built conversations."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import chat


def _conv(*turns):
    return json.dumps([{"role": r, "content": c} for r, c in turns])


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        (1, _conv(("user", "hi"), ("assistant", "hello there"))),
        (2, _conv(("user", "a"), ("user", "b"), ("assistant", "c"))),
        (3, _conv(("user", "q1"), ("assistant", "a1"), ("user", "q2"))),
        (4, _conv(("system", "be nice"), ("user", "q"), ("assistant", "a"))),
        (5, "[{\"role\":\"user\""),          # truncated JSON
        (6, "{\"role\":\"user\"}"),           # object, not array
        (7, "[]"),                              # empty transcript
        (8, _conv(("assistant", "unprompted"))),
    ]
    return spark.createDataFrame(rows, "conv_id long, conv_json string")


class TestParseTurns:
    def test_explode_shape(self, convs):
        turns = chat.parse_turns(convs)
        got = [(r["conv_id"], r["turn_idx"], r["role"])
               for r in turns.where("conv_id = 4").orderBy("turn_idx").collect()]
        assert got == [(4, 0, "system"), (4, 1, "user"), (4, 2, "assistant")]

    def test_malformed_yields_attributable_null_row(self, convs):
        bad = chat.parse_turns(convs).where("conv_id = 5").collect()
        assert len(bad) == 1
        assert bad[0]["turn_idx"] is None and bad[0]["role"] is None

    def test_bare_object_wraps_to_single_turn(self, convs):
        # Spark's from_json wraps a lone JSON object in a 1-element
        # array when an array schema is expected — a bare message
        # parses as a single-turn transcript (documented quirk)
        rows = chat.parse_turns(convs).where("conv_id = 6").collect()
        assert len(rows) == 1
        assert rows[0]["turn_idx"] == 0 and rows[0]["role"] == "user"

    def test_empty_transcript_keeps_null_row(self, convs):
        rows = chat.parse_turns(convs).where("conv_id = 7").collect()
        assert len(rows) == 1 and rows[0]["turn_idx"] is None

    def test_extra_and_missing_fields_tolerated(self, spark):
        df = spark.createDataFrame(
            [
                (1, '[{"role":"user","content":"x","weight":0.5}]'),
                (2, '[{"content":"orphan"}]'),
                (3, '[{"role":"user"}]'),
            ],
            "conv_id long, conv_json string",
        )
        rows = {r["conv_id"]: r for r in chat.parse_turns(df).collect()}
        assert rows[1]["content"] == "x"          # extra field dropped
        assert rows[2]["role"] is None            # missing role -> null
        assert rows[3]["content"] is None         # missing content -> null

    def test_no_shuffle(self, convs):
        from flycatcher_spark import plans

        plans.assert_no_shuffle(chat.parse_turns(convs))


class TestStats:
    @pytest.fixture(scope="class")
    def stats(self, convs):
        return {
            r["conv_id"]: r
            for r in chat.wellformed(
                chat.conversation_stats(chat.parse_turns(convs)), min_turns=2
            ).collect()
        }

    def test_wellformed_pair(self, stats):
        r = stats[1]
        assert r["parse_ok"] and r["alternation_ok"] and r["starts_user"]
        assert r["ends_assistant"] and r["wellformed"]
        assert r["n_turns"] == 2 and r["total_chars"] == 13
        assert r["trainable_chars"] == 11
        assert r["trainable_ratio"] == pytest.approx(11 / 13, abs=1e-6)

    def test_alternation_violation(self, stats):
        assert not stats[2]["alternation_ok"] and not stats[2]["wellformed"]

    def test_ends_with_user(self, stats):
        r = stats[3]
        assert r["alternation_ok"] and not r["ends_assistant"]
        assert not r["wellformed"]

    def test_system_prefix_fails_starts_user_gate(self, stats):
        # strict default: system-first conversations are not
        # "starts_user"; callers wanting system prefixes filter on
        # the component columns instead of the composite
        r = stats[4]
        assert not r["starts_user"] and not r["wellformed"]
        assert r["n_system"] == 1

    def test_parse_failures_report_false_everywhere(self, stats):
        for cid in (5, 7):
            r = stats[cid]
            assert not r["parse_ok"] and not r["wellformed"]
            assert r["n_turns"] == 0 and r["total_chars"] == 0
            assert r["trainable_ratio"] == 0.0
            # gates are real booleans, never null (filterable)
            assert r["alternation_ok"] is False and r["starts_user"] is False

    def test_wrapped_bare_object_counts_one_turn(self, stats):
        r = stats[6]
        assert r["parse_ok"] and r["n_turns"] == 1
        assert not r["wellformed"]  # min_turns=2, no assistant end

    def test_assistant_only(self, stats):
        r = stats[8]
        assert r["parse_ok"] and not r["starts_user"]
        assert r["trainable_ratio"] == 1.0 and not r["wellformed"]

    def test_max_turns_gate(self, convs):
        out = {
            r["conv_id"]: r["wellformed"]
            for r in chat.wellformed(
                chat.conversation_stats(chat.parse_turns(convs)),
                min_turns=2, max_turns=1,
            ).collect()
        }
        assert out[1] is False  # 2 turns > max_turns=1

    def test_trainable_role_override(self, convs):
        r = chat.conversation_stats(
            chat.parse_turns(convs.where("conv_id = 4")),
            trainable_role="system",
        ).collect()[0]
        assert r["trainable_chars"] == len("be nice")
