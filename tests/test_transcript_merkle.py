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
    """Pair-leaf tree (reference merkelize): batch of 3 polys, path checks."""
    n, m = 16, 3
    polys = [
        gl.from_u64(rng.integers(0, P, size=n, dtype=np.uint64)) for _ in range(m)
    ]
    tree = merkle.MerkleTree(polys)
    assert tree.height == 4  # log2(16) digest layers
    root = tree.root()
    idx = np.array([0, 5, 15])
    paths = tree.paths(idx)
    pairs = tree.leaf_pairs(idx)
    left = gl.stack([p[0] for p in pairs], axis=0)  # (m, q)
    right = gl.stack([p[1] for p in pairs], axis=0)
    bottom = merkle.leaf_pair_digest(left, right, m)
    ok = merkle.verify_paths(root, idx, bottom, paths)
    assert bool(ok)
    # tamper: wrong leaf must fail
    bad_left = gl.Gl(left.lo.at[0, 0].add(1), left.hi)
    bad_bottom = merkle.leaf_pair_digest(bad_left, right, m)
    assert not bool(merkle.verify_paths(root, idx, bad_bottom, paths))


def test_merkle_root_vs_oracle():
    """Single-poly pair-leaf tree vs the pure-python Poseidon oracle:
    digest[i] = noop(leaf[2i] || leaf[2i+1]); inner = two_to_one."""
    n = 8
    values = rng.integers(0, P, size=n, dtype=np.uint64)
    tree = merkle.MerkleTree(gl.from_u64(values))
    digests = [
        [int(values[2 * i]), int(values[2 * i + 1]), 0, 0] for i in range(n // 2)
    ]
    while len(digests) > 1:
        digests = [
            oracle.two_to_one(digests[2 * i], digests[2 * i + 1])
            for i in range(len(digests) // 2)
        ]
    assert [int(x) for x in gl.to_u64(tree.root())] == digests[0]


def test_merkle_batch_root_vs_oracle():
    """m=2 polys: digest[i] = two_to_one(noop(col 2i), noop(col 2i+1))."""
    n = 8
    vals = rng.integers(0, P, size=(2, n), dtype=np.uint64)
    polys = [gl.from_u64(vals[0]), gl.from_u64(vals[1])]
    tree = merkle.MerkleTree(polys)
    digests = [
        oracle.two_to_one(
            [int(vals[0, 2 * i]), int(vals[1, 2 * i]), 0, 0],
            [int(vals[0, 2 * i + 1]), int(vals[1, 2 * i + 1]), 0, 0],
        )
        for i in range(n // 2)
    ]
    while len(digests) > 1:
        digests = [
            oracle.two_to_one(digests[2 * i], digests[2 * i + 1])
            for i in range(len(digests) // 2)
        ]
    assert [int(x) for x in gl.to_u64(tree.root())] == digests[0]


def test_merkle_ext_leaves():
    """Ext leaves flatten to [c0, c1]: leaf digest = noop([a0,a1,b0,b1])."""
    n = 8
    a = rng.integers(0, P, size=(n,), dtype=np.uint64)
    b = rng.integers(0, P, size=(n,), dtype=np.uint64)
    tree = merkle.MerkleTree(gl2.from_u64(a, b))
    digests = [
        [int(a[2 * i]), int(b[2 * i]), int(a[2 * i + 1]), int(b[2 * i + 1])]
        for i in range(n // 2)
    ]
    while len(digests) > 1:
        digests = [
            oracle.two_to_one(digests[2 * i], digests[2 * i + 1])
            for i in range(len(digests) // 2)
        ]
    assert [int(x) for x in gl.to_u64(tree.root())] == digests[0]


def test_transcript_kat():
    """Known-answer vectors pinning the FROZEN transcript protocol
    (PROTOCOL.md sections 1-2): byte packing, absorb/permute schedule,
    challenge extraction, fork rule.  Any change to these semantics is a
    protocol break and must fail here."""
    import numpy as np

    from ceno_tpu.field import gl
    from ceno_tpu.transcript import basic as tr

    def u64(x):
        import jax

        return int(np.asarray(jax.device_get(gl.to_u64(x))).reshape(-1)[0])

    def chal(c):
        return (u64(c.c0), u64(c.c1))

    t = tr.Transcript(b"riscv")
    assert chal(t.read_challenge()) == (
        11043950585413292532, 6164229742704003629)
    t.append_field_element_u64(12345)
    assert chal(t.get_and_append_challenge(b"alpha")) == (
        12787108238754250522, 12334414280796259042)
    t.append_message(b"hello world, this is a long message spanning chunks")
    assert chal(t.read_challenge()) == (
        14366662452124276317, 6123310172239886936)
    forks = t.fork(3)
    assert [chal(f.read_challenge()) for f in forks] == [
        (1373730073871460177, 12951794486819739443),
        (2412369158558342330, 16962873252974800415),
        (5230145515932600967, 12459221140893537502),
    ]
    # byte packing (PROTOCOL.md section 1)
    assert tr.bytes_to_field_elements(b"abc").tolist() == [6513249]
    assert tr.bytes_to_field_elements(b"").tolist() == [0]
    assert tr.bytes_to_field_elements(bytes(range(17))).tolist() == [
        506097522914230528, 1084818905618843912, 16]


def test_absorb_exts_rate_chunked():
    """PROTOCOL.md deviation #13: a vector of k ext elements absorbs as its
    2k interleaved base coefficients in rate-8 chunks (one permute each) —
    pinned against the absorb_base primitive, which is KAT-frozen."""
    import numpy as np
    from ceno_tpu.field import gl, gl2

    rng = np.random.default_rng(99)
    vals = rng.integers(0, gl.P, size=(5, 2), dtype=np.uint64)
    es = gl2.stack([gl2.const(int(a), int(b)) for a, b in vals])

    ts = transcript.new(b"chunk")
    got = transcript.absorb_exts(ts, es)

    # oracle: interleave [c0_0, c1_0, c0_1, ...] then absorb_base rate-8
    flat = vals.reshape(-1)  # (10,)
    want = transcript.absorb_base(ts, gl.from_u64(flat[:8]))
    want = transcript.absorb_base(want, gl.from_u64(flat[8:]))
    assert np.array_equal(gl.to_u64(got.state), gl.to_u64(want.state))

    # degree-3 round shape: 4 evals = exactly one rate block
    got4 = transcript.absorb_exts(ts, es[:4])
    want4 = transcript.absorb_base(ts, gl.from_u64(flat[:8]))
    assert np.array_equal(gl.to_u64(got4.state), gl.to_u64(want4.state))
