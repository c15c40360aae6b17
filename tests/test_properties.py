"""Property-based tests (hypothesis) for the pure-Python operator cores —
the pieces whose correctness the oracle can't see: the keyed state-machine
transition and the deterministic sampling hash.
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from data_ingestion_experiment_otp_spark.operators.sampling import _A, _MOD
from data_ingestion_experiment_otp_spark.streaming.state_machine import (
    STATES,
    TERMINAL,
    advance,
)

statuses = st.sampled_from(STATES)
garbage = st.text(min_size=1, max_size=10).filter(lambda s: s not in STATES)
sequences = st.lists(st.one_of(statuses, garbage), max_size=30)


def fold(seq, start=None):
    s = start
    for x in seq:
        s = advance(s, x)
    return s


class TestAdvanceProperties:
    @given(sequences)
    def test_result_always_a_known_state(self, seq):
        assert fold(seq) is None or fold(seq) in STATES

    @given(sequences)
    def test_replay_idempotent(self, seq):
        """Redelivering the full journal to the settled state changes
        nothing — the property that makes at-least-once delivery safe
        (reference semantics: a running subprocess is not respawned)."""
        final = fold(seq)
        assert fold(seq, start=final) == final

    @given(sequences, statuses)
    def test_terminal_states_absorb(self, seq, s):
        final = fold(seq)
        if final in TERMINAL:
            assert advance(final, s) == final

    @given(sequences, garbage)
    def test_unknown_statuses_ignored(self, seq, junk):
        final = fold(seq)
        if final is not None:
            assert advance(final, junk) == final

    @given(sequences)
    def test_progress_never_regresses(self, seq):
        """Along any prefix chain, the state index never decreases except
        into the absorbing error terminal."""
        order = {s: i for i, s in enumerate(STATES)}
        s = None
        for x in seq:
            nxt = advance(s, x)
            if s is not None and nxt != "error":
                assert order[nxt] >= order[s]
            s = nxt


class TestSamplingHashProperties:
    @given(st.integers(min_value=0, max_value=2**40))
    def test_bucket_in_range(self, key):
        assert 0 <= (key * _A) % _MOD < _MOD

    @given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
    def test_sample_of_superset_is_superset_of_sample(self, keys):
        """Inclusion depends only on the key, so growing the dataset never
        changes which existing rows are sampled — dataset-versioning
        stability under incremental ingestion."""
        rate = int(_MOD * 0.1)
        sample = {k for k in keys if (k * _A) % _MOD < rate}
        half = set(list(keys)[: len(keys) // 2])
        half_sample = {k for k in half if (k * _A) % _MOD < rate}
        assert half_sample == sample & half


class TestPackingConservation:
    def test_packs_conserve_tokens_and_fill_windows(self, spark, sf_dir):
        """Sequence packing must conserve the chunk token stream exactly
        (nothing dropped or duplicated by the window arithmetic), and every
        pack except possibly each shard's last must reach the window
        capacity (concat-split packing leaves no internal fragmentation)."""
        from pyspark.sql import functions as F

        from data_ingestion_experiment_otp_spark.operators.text_analysis import (
            _CHUNK_SIZE,
            _PACK_CAP,
            llm_chunk_docs,
            llm_pack_sequences,
        )

        total_chunk_tokens = (
            llm_chunk_docs(spark, sf_dir).agg(F.sum("n_tokens")).collect()[0][0]
        )
        packs = llm_pack_sequences(spark, sf_dir).collect()
        assert sum(r.n_tokens for r in packs) == total_chunk_tokens
        last_per_shard = {}
        for r in packs:
            last_per_shard[r.shard] = max(last_per_shard.get(r.shard, -1), r.pack_id)
        for r in packs:
            if r.pack_id < last_per_shard[r.shard]:
                # whole chunks assign by start offset, so a non-final pack
                # fills to within one chunk of capacity on either side
                assert _PACK_CAP - _CHUNK_SIZE < r.n_tokens < _PACK_CAP + _CHUNK_SIZE, (
                    r.shard, r.pack_id, r.n_tokens
                )
