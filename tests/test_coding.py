"""Round-trip and rate tests for the native rANS coder + tables + container."""

import numpy as np
import pytest

from nic_tpu.coding import CdfTable, PackedBitstream, RansCoder, pmf_to_quantized_cdf


@pytest.fixture(scope="module")
def coder():
    return RansCoder()


def make_gaussian_table(scales=(0.5, 1.0, 4.0, 16.0), width=64):
    import scipy.stats

    rows = len(scales)
    L = 2 * width + 1
    pmf = np.zeros((rows, L))
    for i, s in enumerate(scales):
        grid = np.arange(-width, width + 1)
        pmf[i] = scipy.stats.norm.cdf(grid + 0.5, 0, s) - scipy.stats.norm.cdf(grid - 0.5, 0, s)
    tail = 1.0 - pmf.sum(axis=1)
    lengths = np.full(rows, L)
    offsets = np.full(rows, -width)
    return CdfTable.from_pmf(pmf, offsets, lengths, tail)


class TestQuantizedCdf:
    def test_total_and_monotone(self):
        pmf = np.array([[0.5, 0.3, 0.2], [0.9, 0.05, 0.05]])
        tail = np.array([0.0, 0.0])
        lengths = np.array([3, 3])
        cdfs, sizes = pmf_to_quantized_cdf(pmf, tail, lengths, precision=16)
        assert (sizes == 4).all()
        for r in range(2):
            row = cdfs[r, : sizes[r] + 1]
            assert row[0] == 0 and row[-1] == 1 << 16
            assert (np.diff(row) >= 1).all(), "every slot needs nonzero freq"

    def test_tiny_probabilities_get_nonzero_freq(self):
        pmf = np.array([[1 - 3e-9, 1e-9, 1e-9]])
        cdfs, sizes = pmf_to_quantized_cdf(pmf, np.array([1e-9]), np.array([3]))
        assert (np.diff(cdfs[0, :5]) >= 1).all()


class TestRansRoundtrip:
    def test_basic_roundtrip(self, coder, rng):
        table = make_gaussian_table()
        n = 10000
        indexes = rng.integers(0, 4, n).astype(np.int32)
        scales = np.array([0.5, 1.0, 4.0, 16.0])[indexes]
        values = np.round(rng.normal(0, scales)).astype(np.int32)
        symbols = table.symbols_from_values(values, indexes)
        data = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        decoded = coder.decode(data, indexes, table.cdfs, table.cdf_sizes)
        np.testing.assert_array_equal(decoded, symbols)
        back = table.values_from_symbols(decoded, indexes)
        np.testing.assert_array_equal(back, values)

    def test_out_of_range_escape(self, coder):
        """Values far outside the table support must still round-trip."""
        table = make_gaussian_table(width=4)
        values = np.array([-1000, -6, -5, 0, 5, 6, 1000, 123456, -123456], np.int32)
        indexes = np.zeros_like(values)
        symbols = table.symbols_from_values(values, indexes)
        data = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        decoded = coder.decode(data, indexes, table.cdfs, table.cdf_sizes)
        back = table.values_from_symbols(decoded, indexes)
        np.testing.assert_array_equal(back, values)

    def test_bucket_index_path_roundtrip_with_escapes(self, coder, rng):
        """Large-n decode takes the per-row bucket-index search (built when
        n >= 4*rows, rans.cpp want_bucket_index); must agree bit-for-bit
        with the small-n binary-search path, escapes included."""
        table = make_gaussian_table()
        rows = table.cdf_sizes.shape[0]
        n = 64 * rows  # well past the 4*rows gate
        indexes = rng.integers(0, rows, n).astype(np.int32)
        scales = np.array([0.5, 1.0, 4.0, 16.0])[indexes % 4]
        values = np.round(rng.normal(0, scales)).astype(np.int32)
        values[:: n // 37] = 5000  # force escape/bypass codes throughout
        values[1:: n // 41] = -7777
        symbols = table.symbols_from_values(values, indexes)
        data = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        decoded = coder.decode(data, indexes, table.cdfs, table.cdf_sizes)
        back = table.values_from_symbols(decoded, indexes)
        np.testing.assert_array_equal(back, values)
        # The same stream decoded per-chunk (n < 4*rows, plain search) must
        # not exist — instead cross-check by re-encoding the decoded
        # symbols: identical bytes prove identical symbol recovery.
        assert coder.encode(
            decoded, indexes, table.cdfs, table.cdf_sizes
        ) == data

    def test_rate_close_to_entropy(self, coder, rng):
        """Actual bits within a few percent of the model entropy."""
        table = make_gaussian_table(scales=(2.0,), width=32)
        n = 100_000
        values = np.round(rng.normal(0, 2.0, n)).astype(np.int32)
        indexes = np.zeros(n, np.int32)
        symbols = table.symbols_from_values(values, indexes)
        data = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        import scipy.stats

        grid = np.arange(-32, 33)
        p = scipy.stats.norm.cdf(grid + 0.5, 0, 2.0) - scipy.stats.norm.cdf(grid - 0.5, 0, 2.0)
        p = p[p > 0]
        p /= p.sum()
        entropy_bits = -np.sum(p * np.log2(p)) * n
        actual_bits = len(data) * 8
        assert actual_bits < entropy_bits * 1.02 + 64
        assert actual_bits > entropy_bits * 0.98

    def test_empty_and_single(self, coder):
        table = make_gaussian_table(width=4)
        for values in ([], [3]):
            values = np.asarray(values, np.int32)
            indexes = np.zeros_like(values)
            symbols = table.symbols_from_values(values, indexes) if values.size else values
            data = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
            decoded = coder.decode(data, indexes, table.cdfs, table.cdf_sizes)
            np.testing.assert_array_equal(decoded, symbols)

    def test_deterministic(self, coder, rng):
        table = make_gaussian_table()
        values = np.round(rng.normal(0, 4, 500)).astype(np.int32)
        indexes = (np.arange(500) % 4).astype(np.int32)
        symbols = table.symbols_from_values(values, indexes)
        d1 = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        d2 = coder.encode(symbols, indexes, table.cdfs, table.cdf_sizes)
        assert d1 == d2


class TestContainer:
    def test_pack_unpack(self):
        p = PackedBitstream()
        p.add_stream("y", b"\x01\x02\x03")
        p.add_stream("z", b"sidestream")
        p.add_ints("x_shape", [768, 512])
        p.add_ints("y_shape", [48, 32])
        blob = p.pack()
        q = PackedBitstream.unpack(blob)
        assert q.get_stream("y") == b"\x01\x02\x03"
        assert q.get_stream("z") == b"sidestream"
        assert q.get_ints("x_shape") == [768, 512]

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            PackedBitstream.unpack(b"JUNKxxxx")


class TestBatchCoding:
    """Thread-parallel per-image streams (production host-coding path)."""

    def test_batch_roundtrip_matches_single(self, coder, rng):
        table = make_gaussian_table()
        n_items, n_per = 6, 5000
        indexes = rng.integers(0, 4, (n_items, n_per)).astype(np.int32)
        scales = np.array([0.5, 1.0, 4.0, 16.0])[indexes]
        values = np.round(rng.normal(0, scales)).astype(np.int32)
        symbols = values - table.offsets[indexes]
        streams = coder.encode_batch(symbols, indexes, table.cdfs, table.cdf_sizes)
        assert len(streams) == n_items
        # Each stream must equal the single-stream encoding of that item.
        for i in range(n_items):
            single = coder.encode(symbols[i], indexes[i], table.cdfs, table.cdf_sizes)
            assert streams[i] == single
        decoded = coder.decode_batch(streams, indexes, table.cdfs, table.cdf_sizes)
        np.testing.assert_array_equal(decoded, symbols)

    def test_batch_single_item(self, coder, rng):
        table = make_gaussian_table()
        indexes = rng.integers(0, 4, (1, 100)).astype(np.int32)
        symbols = np.zeros_like(indexes)
        streams = coder.encode_batch(symbols, indexes, table.cdfs, table.cdf_sizes)
        decoded = coder.decode_batch(streams, indexes, table.cdfs, table.cdf_sizes)
        np.testing.assert_array_equal(decoded, symbols)
