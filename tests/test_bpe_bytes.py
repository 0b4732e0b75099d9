"""Byte-level (GPT-2-style) BPE: pre-tokenizer fidelity (true
lookahead pattern vs the engine-portable sentinel formulation, pure
Python and as a Spark Column), byte-alphabet tables, merge learning,
kernel-vs-portable-twin parity, tokenizer-file interop, and the
byte-level counter feeding pack_sequences / budget_mix."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import bpe, quality

DOCS = "/root/testdata/sf0.001/documents.parquet"

#: Strings that exercise every branch the portable formulation has to
#: get right: multi-space runs (sentinel split), single spaces
#: (attach to next token), non-space whitespace before words,
#: contractions, digits, punctuation, unicode letters, NULs, and the
#: trailing-run arm of the lookahead.
ADVERSARIAL = [
    "Hello world",
    "Hello  world",
    "a   b",
    "multi    space   runs",
    "I've got 2nd place!",
    "don't stop 'til",
    "  leading",
    "trailing   ",
    " ",
    "",
    "a\n\nb",
    "x \n y",
    "  \n word",
    " \n  !",
    "word\n",
    "\n",
    "\x0b\x0bv",
    "mix \t\n\x0b\f\r end",
    "é café Ωmega",
    "123abc",
    "a'sb 'll're",
    "a \x00 b",
]


def _portable_py(text: str) -> list[str]:
    """Pure-Python replay of the sentinel + lookahead-free pipeline
    that bpe.pretokens runs in Spark and the oracle in DuckDB."""
    import regex

    text = text.replace("\x00", "")
    marked = regex.sub(
        bpe._SENTINEL_PATTERN, lambda m: m.group(1) + "\x00" + m.group(2), text
    )
    out: list[str] = []
    for seg in marked.split("\x00"):
        out.extend(regex.findall(bpe.GPT2_SPLIT_PORTABLE, seg))
    return out


class TestByteTable:
    def test_bijection_over_all_bytes(self):
        b2u = bpe.bytes_to_unicode()
        assert len(b2u) == 256
        assert len(set(b2u.values())) == 256
        u2b = bpe.unicode_to_bytes()
        assert all(u2b[u] == b for b, u in b2u.items())

    def test_known_anchors(self):
        b2u = bpe.bytes_to_unicode()
        assert b2u[ord(" ")] == "Ġ"  # Ġ
        assert b2u[ord("\n")] == "Ċ"  # Ċ
        assert b2u[ord("a")] == "a"
        assert b2u[ord("!")] == "!"

    def test_symbol_roundtrip_multibyte(self):
        syms = bpe._to_byte_symbols(" café")
        assert syms[0] == "Ġ"
        assert len(syms) == len(" café".encode("utf-8"))
        assert bpe._symbols_to_hex("Ġl") == "206C"


class TestPretokenizer:
    def test_known_gpt2_splits(self):
        assert bpe.gpt2_pretokenize("Hello world") == ["Hello", " world"]
        assert bpe.gpt2_pretokenize("Hello  world") == ["Hello", " ", " world"]
        assert bpe.gpt2_pretokenize("I've got 2nd!") == [
            "I", "'ve", " got", " 2", "nd", "!",
        ]
        assert bpe.gpt2_pretokenize("trailing   ") == ["trailing", "   "]
        # the run splits before its last char; a space attaches forward
        assert bpe.gpt2_pretokenize("a   b") == ["a", "  ", " b"]
        # a non-space last char stands alone instead
        assert bpe.gpt2_pretokenize("a  \nb") == ["a", "  ", "\n", "b"]

    def test_portable_equals_true_pattern_on_fixtures(self):
        for t in ADVERSARIAL:
            assert _portable_py(t) == bpe.gpt2_pretokenize(t), repr(t)

    def test_portable_equals_true_pattern_fuzzed(self):
        alpha = list("ab B1 .'\t\n\x0b\f\ré Ω2")
        rng = random.Random(20260816)
        for _ in range(2000):
            t = "".join(
                rng.choice(alpha) for _ in range(rng.randint(0, 30))
            )
            assert _portable_py(t) == bpe.gpt2_pretokenize(t), repr(t)

    def test_spark_column_equals_reference(self, spark):
        texts = ADVERSARIAL + [
            r["text"] for r in spark.read.parquet(DOCS).limit(40).collect()
        ]
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["i", "text"]
        )
        got = {
            r["i"]: r["toks"]
            for r in sdf.select(
                "i", bpe.pretokens("text").alias("toks")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == bpe.gpt2_pretokenize(t), repr(t)[:80]


class TestTraining:
    def test_byte_word_counts_keep_case_and_space(self, spark):
        docs = spark.createDataFrame(
            [("Low low low",)], "text string"
        )
        wc = {
            r["word"]: r["cnt"]
            for r in bpe.byte_word_counts(docs).collect()
        }
        assert wc == {"Low": 1, " low": 2}

    def test_learned_merges_are_byte_symbols(self, spark):
        docs = spark.createDataFrame(
            [("low low low lower",)], "text string"
        )
        merges = bpe.learn_merges_bytes(
            bpe.byte_word_counts(docs), n_merges=4
        )
        # " low" x3 as Ġlow dominates: Ġ+l first (ties break lexi:
        # (Ġ,l)=3, (l,o)=4, (o,w)=4 -> (l,o) then (o,w)... count:
        # low:1, Ġlow:2, Ġlower:1 -> lo:4, ow:4, Ġl:3
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")
        assert ("Ġ", "low") in merges

    def test_byte_vocab_from_merges_gpt2_convention(self):
        merges = [("l", "o"), ("lo", "w")]
        vocab = bpe.byte_vocab_from_merges(merges)
        assert len(vocab) == 258
        assert vocab["a"] == ord("a")  # byte ids 0..255 first
        assert vocab["lo"] == 256 and vocab["low"] == 257


class TestApplication:
    @pytest.fixture(scope="class")
    def merges(self, spark):
        docs = spark.read.parquet(DOCS)
        return bpe.learn_merges_bytes(
            bpe.byte_word_counts(docs, max_vocab_words=500), n_merges=25
        )

    def test_kernel_equals_portable_twin_on_corpus(self, spark, merges):
        docs = spark.read.parquet(DOCS).limit(200)
        twin = {
            r["doc_id"]: r["n_bpe"]
            for r in bpe.bpe_bytes_symbol_counts(docs, merges).collect()
        }
        kern = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id",
                bpe.bpe_bytes_token_count("text", merges).alias("n"),
            ).collect()
        }
        assert twin == kern

    def test_kernel_equals_twin_on_adversarial(self, spark):
        # repeat-adjacent pairs (the banana class) + whitespace runs
        merges = [("a", "n"), ("an", "an"), ("Ġ", "b"), ("Ġb", "anan")]
        texts = ["banana bananas", "anananan", "b  anan", "ba na\nna"]
        sdf = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )
        twin = {
            r["doc_id"]: r["n_bpe"]
            for r in bpe.bpe_bytes_symbol_counts(sdf, merges).collect()
        }
        kern = {
            r["doc_id"]: r["n"]
            for r in sdf.select(
                "doc_id",
                bpe.bpe_bytes_token_count("text", merges).alias("n"),
            ).collect()
        }
        assert twin == kern

    def test_hand_computed_counts(self, spark):
        # "low low" -> pre-tokens ["low", " low"] -> merges make each
        # a single piece -> 2 tokens total
        merges = [("l", "o"), ("lo", "w"), ("Ġ", "low")]
        sdf = spark.createDataFrame([(1, "low low")], ["doc_id", "text"])
        [row] = sdf.select(
            bpe.bpe_bytes_token_count("text", merges).alias("n")
        ).collect()
        assert row["n"] == 2
        # multibyte: "é" is 2 bytes -> 2 tokens unmerged
        [row] = (
            spark.createDataFrame([(1, "é")], ["doc_id", "text"])
            .select(bpe.bpe_bytes_token_count("text", []).alias("n"))
            .collect()
        )
        assert row["n"] == 2

    def test_encode_pieces_and_ids(self, spark):
        merges = [("l", "o"), ("lo", "w"), ("Ġ", "low")]
        vocab = bpe.byte_vocab_from_merges(merges)
        sdf = spark.createDataFrame([(1, "low low"), (2, None)], ["doc_id", "text"])
        rows = {
            r["doc_id"]: (r["p"], r["ids"])
            for r in sdf.select(
                "doc_id",
                bpe.bpe_bytes_encode("text", merges).alias("p"),
                bpe.bpe_bytes_encode_ids("text", merges, vocab).alias("ids"),
            ).collect()
        }
        assert rows[1][0] == ["low", "Ġlow"]
        assert rows[1][1] == [vocab["low"], vocab["Ġlow"]]
        assert rows[2] == (None, None)

    def test_null_and_empty_text(self, spark):
        sdf = spark.createDataFrame(
            [(1, None), (2, "")], ["doc_id", "text"]
        )
        out = bpe.bpe_bytes_symbol_counts(sdf, [("l", "o")])
        assert out.count() == 0  # both drop: nothing to tokenize
        kern = {
            r["doc_id"]: r["n"]
            for r in sdf.select(
                "doc_id",
                bpe.bpe_bytes_token_count(
                    "text", [("l", "o")]
                ).alias("n"),
            ).collect()
        }
        assert kern == {1: None, 2: 0}


class TestInterop:
    def test_merges_txt_roundtrip_with_byte_symbols(self, tmp_path):
        merges = [("Ġ", "t"), ("Ġt", "he"), ("Ċ", "Ċ")]
        p = str(tmp_path / "merges.txt")
        bpe.save_merges(merges, p)
        assert bpe.load_merges(p) == merges

    def test_vocab_json_roundtrip(self, tmp_path):
        vocab = bpe.byte_vocab_from_merges([("l", "o")])
        p = str(tmp_path / "vocab.json")
        bpe.save_vocab(vocab, p)
        assert bpe.load_vocab(p) == vocab


class TestPipelineIntegration:
    """The byte-level counter is a drop-in token_count for the
    packing and budget operators (they take any Column/col name)."""

    def test_pack_sequences_with_byte_counter(self, spark):
        merges = [("l", "o"), ("lo", "w"), ("Ġ", "low")]
        docs = spark.createDataFrame(
            [(1, "low low low"), (2, "low"), (3, "wol")],
            ["doc_id", "text"],
        ).select(
            "doc_id",
            bpe.bpe_bytes_token_count("text", merges).alias("n_tok"),
        )
        out = quality.pack_sequences(docs, "n_tok", seq_len=4)
        total = out.agg(F.sum("n_toks")).collect()[0][0]
        assert total == docs.agg(F.sum("n_tok")).collect()[0][0]
        assert (
            out.agg(
                F.max(F.col("start_in_seq") + F.col("n_toks"))
            ).collect()[0][0]
            <= 4
        )

    def test_budget_mix_with_byte_counter(self, spark):
        merges = [("l", "o"), ("lo", "w"), ("Ġ", "low")]
        docs = spark.createDataFrame(
            [(1, "a", "low low"), (2, "a", "low"), (3, "b", "wol")],
            ["doc_id", "src", "text"],
        ).withColumn(
            "n_tok", bpe.bpe_bytes_token_count("text", merges)
        )
        out = quality.budget_mix(
            docs, "src", "doc_id", F.col("n_tok"), 100, budgets={"a": 2}
        )
        assert out.count() >= 1


class TestSpecialTokens:
    """r9: atomic special tokens — matched longest-first before the
    pre-tokenizer, never merged across, mapped straight to ids."""

    MERGES = [("l", "o"), ("lo", "w"), ("Ġ", "low")]
    EOT = "<|endoftext|>"

    def test_special_is_atomic_piece(self, spark):
        df = spark.createDataFrame(
            [(1, f"low{self.EOT} low")], ["doc_id", "text"]
        )
        row = df.select(
            bpe.bpe_bytes_encode(
                "text", self.MERGES, special_tokens=[self.EOT]
            ).alias("p")
        ).first()
        assert row.p == ["low", self.EOT, "Ġlow"]

    def test_without_registration_special_is_plain_text(self, spark):
        df = spark.createDataFrame(
            [(1, f"low{self.EOT}low")], ["doc_id", "text"]
        )
        row = df.select(
            bpe.bpe_bytes_encode("text", self.MERGES).alias("p")
        ).first()
        # the literal is just characters: < | e n d ... tokenized
        assert self.EOT not in row.p and len(row.p) > 3

    def test_merges_never_cross_boundary(self, spark):
        # "l" + EOT + "ow": without the boundary "low" could merge
        df = spark.createDataFrame(
            [(1, f"l{self.EOT}ow")], ["doc_id", "text"]
        )
        row = df.select(
            bpe.bpe_bytes_encode(
                "text", self.MERGES, special_tokens=[self.EOT]
            ).alias("p")
        ).first()
        assert self.EOT in row.p and "low" not in row.p

    def test_ids_map_directly(self, spark):
        vocab = bpe.byte_vocab_from_merges(self.MERGES)
        df = spark.createDataFrame(
            [(1, f"low{self.EOT} low{self.EOT}")], ["doc_id", "text"]
        )
        row = df.select(
            bpe.bpe_bytes_encode_ids(
                "text", self.MERGES, vocab,
                special_tokens={self.EOT: 50256},
            ).alias("ids")
        ).first()
        assert row.ids.count(50256) == 2
        assert row.ids[1] == 50256 and row.ids[-1] == 50256

    def test_count_matches_pieces(self, spark):
        df = spark.createDataFrame(
            [(1, f"{self.EOT}low low{self.EOT}wol")], ["doc_id", "text"]
        )
        got = df.select(
            bpe.bpe_bytes_token_count(
                "text", self.MERGES, special_tokens=[self.EOT]
            ).alias("n"),
            bpe.bpe_bytes_encode(
                "text", self.MERGES, special_tokens=[self.EOT]
            ).alias("p"),
        ).first()
        assert got.n == len(got.p)

    def test_longest_first_overlap(self, spark):
        a, b = "<|eot|>", "<|eot|><|eot|>"
        df = spark.createDataFrame([(1, b)], ["doc_id", "text"])
        row = df.select(
            bpe.bpe_bytes_encode(
                "text", self.MERGES, special_tokens=[a, b]
            ).alias("p")
        ).first()
        assert row.p == [b]  # the longer literal wins
