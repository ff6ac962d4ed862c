"""Property tests for the content-defined chunker
(manifest._chunk_paths) — the invariants the segmented manifest's
structural sharing rests on. Pure function, no Spark session needed.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from popelines_spark.manifest import _chunk_paths

paths = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=40,
    ),
    max_size=200,
)


@given(paths, st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_chunking_roundtrips_exactly(listed, target):
    """concat(chunks) == input, order preserved, no chunk empty."""
    chunks = _chunk_paths(listed, target)
    assert [p for c in chunks for p in c] == listed
    assert all(c for c in chunks)


@given(paths, st.integers(min_value=2, max_value=8))
@settings(max_examples=200, deadline=None)
def test_chunking_is_deterministic_and_content_addressed(listed, target):
    """Same input, same chunks — and equal-content prefixes chunk
    identically regardless of what follows (boundaries depend only on
    each item), which is what lets a child reuse its parent's leading
    chunks by content hash."""
    assert _chunk_paths(listed, target) == _chunk_paths(listed, target)
    if len(listed) >= 2:
        full = _chunk_paths(listed, target)
        head = _chunk_paths(listed[:-1], target)
        # every COMPLETE chunk of the prefix run is a chunk of the full
        # run (only the trailing partial chunk may differ)
        assert full[: max(0, len(head) - 1)] == head[: len(head) - 1]


@given(
    st.lists(st.text(alphabet="abcdef/0123456789", min_size=3,
                     max_size=30), min_size=5, max_size=120, unique=True),
    st.lists(st.text(alphabet="ghijkl/0123456789", min_size=3,
                     max_size=30), min_size=1, max_size=20, unique=True),
    st.integers(min_value=2, max_value=6),
)
@settings(max_examples=150, deadline=None)
def test_single_run_insertion_disturbs_bounded_chunks(parent, batch, target):
    """Structural sharing: inserting one contiguous run of new paths
    into the sorted list destroys at most TWO of the parent's chunks
    (the one holding the insertion point, plus the boundary-straddling
    neighbor) — never a rechunk of the table."""
    parent = sorted(set(parent) - set(batch))
    child = sorted(set(parent) | set(batch))
    # the batch must land contiguously for the single-run bound: force
    # it by construction (disjoint alphabets make batch sort as a run
    # only sometimes — find its actual span and require contiguity)
    pos = [child.index(b) for b in sorted(batch)]
    if pos != list(range(min(pos), min(pos) + len(pos))):
        return  # not a single run under this draw — bound not claimed
    pc = {tuple(c) for c in _chunk_paths(parent, target)}
    cc = {tuple(c) for c in _chunk_paths(child, target)}
    destroyed = pc - cc
    assert len(destroyed) <= 2, (
        f"single-run insertion destroyed {len(destroyed)} parent chunks"
    )
