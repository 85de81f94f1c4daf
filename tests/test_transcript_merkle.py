"""Transcript + Merkle tests."""

import numpy as np

import poseidon_oracle as oracle
from ceno_tpu.field import gl, gl2
from ceno_tpu.hash import merkle, poseidon
from ceno_tpu.transcript import basic as transcript

P = gl.P
rng = np.random.default_rng(7)


def test_transcript_matches_oracle_semantics():
    # replicate: new(label) -> absorb elems -> challenge, with the int oracle
    label = b"test_label"
    ts = transcript.new(label)
    elems = rng.integers(0, P, 3, dtype=np.uint64)
    ts = transcript.absorb_base(ts, gl.from_u64(elems))
    c = transcript.read_challenge(ts)

    # oracle
    state = [0] * 12
    packed = transcript.bytes_to_field_elements(label)
    for i, v in enumerate(packed):
        state[i] = int(v)
    state = oracle.permute(state)
    for i, v in enumerate(elems):
        state[i] = int(v)
    state = oracle.permute(state)
    got = gl2.to_u64(c)
    assert int(got[0]) == state[0] and int(got[1]) == state[1]


def test_read_challenge_no_permute():
    ts = transcript.new(b"x")
    c1 = gl2.to_u64(transcript.read_challenge(ts))
    c2 = gl2.to_u64(transcript.read_challenge(ts))
    assert np.array_equal(c1, c2)


def test_get_and_append_challenge_changes():
    ts = transcript.new(b"x")
    ts, c1 = transcript.get_and_append_challenge(ts, b"a")
    ts, c2 = transcript.get_and_append_challenge(ts, b"a")
    assert not np.array_equal(gl2.to_u64(c1), gl2.to_u64(c2))


def test_fork_distinct():
    ts = transcript.new(b"x")
    forks = transcript.fork(ts, 3)
    vals = [gl2.to_u64(transcript.read_challenge(f)) for f in forks]
    assert not np.array_equal(vals[0], vals[1])
    assert not np.array_equal(vals[1], vals[2])


def test_mutable_wrapper_equivalent():
    t = transcript.Transcript(b"lbl")
    t.append_field_elements(gl.from_u64(np.array([5, 6], dtype=np.uint64)))
    c = t.get_and_append_challenge(b"ch")

    ts = transcript.new(b"lbl")
    ts = transcript.absorb_base(ts, gl.from_u64(np.array([5, 6], dtype=np.uint64)))
    ts, c2 = transcript.get_and_append_challenge(ts, b"ch")
    assert np.array_equal(gl2.to_u64(c), gl2.to_u64(c2))
    assert t.field_appended_num == 2 + 1  # 2 elems + 1 label element


def test_merkle_build_and_verify():
    n, m = 16, 3
    values = gl.from_u64(rng.integers(0, P, size=(m, n), dtype=np.uint64))
    tree = merkle.MerkleTree(values)
    assert tree.height == 4
    root = tree.root()
    idx = np.array([0, 5, 15])
    paths = tree.paths(idx)
    leaves = tree.leaf_values(idx)
    for k, i in enumerate(idx):
        ok = merkle.verify_path(
            root,
            int(i),
            gl.Gl(leaves.lo[:, k], leaves.hi[:, k]),
            gl.Gl(paths.lo[:, :, k], paths.hi[:, :, k]),
            tree.height,
        )
        assert ok, i
    # tamper: wrong leaf must fail
    bad = gl.Gl(leaves.lo[:, 0] + 1, leaves.hi[:, 0])
    assert not merkle.verify_path(
        root, int(idx[0]), bad,
        gl.Gl(paths.lo[:, :, 0], paths.hi[:, :, 0]), tree.height,
    )


def test_merkle_root_vs_oracle():
    n = 8
    values = gl.from_u64(rng.integers(0, P, size=(2, n), dtype=np.uint64))
    tree = merkle.MerkleTree(values)
    # oracle: leaf digest = noop-pad (2 values -> digest), then two_to_one up
    vals = np.asarray(gl.to_u64(values))
    digests = [[int(vals[0, i]), int(vals[1, i]), 0, 0] for i in range(n)]
    while len(digests) > 1:
        digests = [
            oracle.two_to_one(digests[2 * i], digests[2 * i + 1])
            for i in range(len(digests) // 2)
        ]
    assert [int(x) for x in gl.to_u64(tree.root())] == digests[0]


def test_merkle_ext_leaves():
    n = 8
    a = rng.integers(0, P, size=(n,), dtype=np.uint64)
    b = rng.integers(0, P, size=(n,), dtype=np.uint64)
    values = gl2.from_u64(a, b)
    tree = merkle.MerkleTree(values)
    # ext leaf (c0, c1) == base matrix [[c0],[c1]]
    tree2 = merkle.MerkleTree(gl.from_u64(np.stack([a, b])))
    assert np.array_equal(gl.to_u64(tree.root()), gl.to_u64(tree2.root()))
