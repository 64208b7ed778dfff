"""Bitstream bit-exactness harness (SURVEY.md §7 hard part 1, VERDICT r1 #4).

The contract that makes cross-implementation parity testable without the
(empty) reference mount: GIVEN the same integer CDF tables, the coder must
produce byte-identical bitstreams — across processes, runs, backends, and
framework versions. These tests inject hand-crafted tables (never derived
from float PMFs, so no float-stack dependence at all) and pin the encoded
bytes to frozen goldens recorded at table-design time.
"""

import subprocess
import sys

import numpy as np

from compression_tpu.codec import host as codec

PRECISION = 12

# Frozen goldens for _craft_tables()/_symbols() below. If these ever change,
# the coder's wire format changed — that is a compatibility BREAK, not a
# test to update casually (every previously-written bitstream goes stale).
GOLDEN_HEX = (
    "00f9319da1cf4cc716466e72b83e630a4404b262cbfb3eafe440c222a1fa"
    "bf96e566e9abf2be00",
    "007d22bdac907a5fa4066d39ecf0c57774637106ef38b039e810f2dbf515"
    "6d0b92774a244abe00",
)


def _craft_tables():
    """3 hand-crafted CDF rows (dyadic masses, exact integers; includes the
    escape symbol as the last entry of each row)."""
    rows, lens, offs = [], [], []
    maxlen = 8
    for r in range(3):
        num_symbols = 4 + r
        masses = [2**PRECISION // (2 * num_symbols)] * num_symbols
        masses[0] += 2**PRECISION - sum(masses)
        vals = [0]
        c = 0
        for m in masses:
            c += m
            vals.append(c)
        row = np.zeros(maxlen + 1, np.int32)
        row[: len(vals)] = vals
        rows.append(row)
        lens.append(num_symbols + 1)
        offs.append(-(num_symbols // 2))
    return (
        np.stack(rows),
        np.asarray(lens, np.int32),
        np.asarray(offs, np.int32),
    )


def _symbols():
    rng = np.random.RandomState(7)
    values = rng.randint(-3, 4, size=(2, 64)).astype(np.int32)
    values[0, 5] = 1000      # escape path (overflow magnitude, positive)
    values[1, 9] = -77777    # escape path, negative
    indexes = (np.arange(64) % 3).astype(np.int32)[None].repeat(2, 0)
    return values, indexes


def test_injected_tables_bitstream_matches_golden():
    cdfs, lengths, offsets = _craft_tables()
    values, indexes = _symbols()
    strings = codec.entropy_encode(
        values, indexes, cdfs, lengths, offsets, PRECISION
    )
    assert tuple(s.hex() for s in strings) == GOLDEN_HEX
    dec = codec.entropy_decode(
        strings, indexes, cdfs, lengths, offsets, PRECISION
    )
    np.testing.assert_array_equal(dec, values)


def test_bitstream_identical_across_process_restart():
    """Re-encoding in a FRESH interpreter yields byte-identical streams (no
    dependence on process state: hash seeds, allocation order, thread
    scheduling)."""
    prog = (
        "import sys; sys.path.insert(0, '/root/repo'); "
        "import tests.test_bitexact as t; "
        "from compression_tpu.codec import host as codec; "
        "c, l, o = t._craft_tables(); v, i = t._symbols(); "
        "s = codec.entropy_encode(v, i, c, l, o, t.PRECISION); "
        "print(','.join(x.hex() for x in s))"
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
        check=True,
    )
    assert tuple(out.stdout.strip().split(",")) == GOLDEN_HEX


def test_entropy_model_with_injected_tables_is_deterministic():
    """End-to-end injection at the entropy-model level: two independently
    constructed models with the same injected tables produce identical
    bitstreams and exact round-trips — the 'same tables => same bytes'
    contract that checkpoint-imported reference tables rely on."""
    from compression_tpu.distributions.uniform_noise import NoisyNormal
    from compression_tpu.entropy_models import ContinuousBatchedEntropyModel
    from compression_tpu.entropy_models.continuous_base import CdfTables

    cdfs, lengths, offsets = _craft_tables()
    tables = CdfTables(
        cdf=cdfs,
        cdf_length=lengths,  # _craft_tables lengths already count CDF entries
        cdf_offset=offsets,
        offset=np.zeros(3, np.float64),
        precision=PRECISION,
    )
    prior = NoisyNormal(loc=np.zeros(3), scale=np.ones(3))

    def build():
        return ContinuousBatchedEntropyModel(
            prior, coding_rank=3, compression=True, tables=tables
        )

    y = np.asarray(
        np.random.RandomState(3).randint(-2, 3, size=(2, 4, 5, 3)),
        np.float32,
    )
    s1 = build().compress(y)
    s2 = build().compress(y)
    assert [a.hex() for a in s1] == [a.hex() for a in s2]
    em = build()
    out = em.decompress(s1, (4, 5))
    np.testing.assert_allclose(np.asarray(out), y, atol=1e-6)
