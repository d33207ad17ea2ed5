"""LMDB file-format compatibility layer: reader/writer round trips,
B+tree depth, overflow chains, reference CodeRow pickle conventions
(reference ``extract_code.py:42-83``, ``lmdb_dataset.py:18-89``)."""

import pickle
from collections import namedtuple

import numpy as np
import pytest

from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
    CodeRow, LMDBCodesDataset, LMDBReader, LMDBWriter, write_codes_lmdb)


def test_round_trip_inline_values(tmp_path):
    entries = {f"key_{i:04d}".encode(): f"value-{i}".encode() * 3
               for i in range(200)}
    with LMDBWriter(tmp_path / "db") as w:
        for k, v in entries.items():
            w.put(k, v)
    with LMDBReader(tmp_path / "db") as r:
        assert r.stat()["entries"] == 200
        for k, v in entries.items():
            assert r.get(k) == v
        assert r.get(b"missing") is None
        items = list(r.items())
        assert [k for k, _ in items] == sorted(entries)
        assert dict(items) == entries


def test_overflow_values(tmp_path):
    rng = np.random.default_rng(0)
    entries = {f"big{i}".encode(): rng.integers(0, 255, 9000,
                                                dtype=np.uint8).tobytes()
               for i in range(5)}
    entries[b"small"] = b"x"
    with LMDBWriter(tmp_path / "db") as w:
        for k, v in entries.items():
            w.put(k, v)
    with LMDBReader(tmp_path / "db") as r:
        assert r.stat()["overflow_pages"] >= 5 * 3  # 9000B > 2 pages each
        for k, v in entries.items():
            assert r.get(k) == v


def test_deep_tree_small_pages(tmp_path):
    """psize=512 forces a branch-of-branches tree (depth >= 3)."""
    entries = {f"{i:06d}".encode(): f"payload-{i}-".encode() * 8
               for i in range(800)}
    with LMDBWriter(tmp_path / "db", psize=512) as w:
        for k, v in entries.items():
            w.put(k, v)
    with LMDBReader(tmp_path / "db") as r:
        stat = r.stat()
        assert stat["psize"] == 512
        assert stat["depth"] >= 3
        for k, v in entries.items():
            assert r.get(k) == v
        assert [k for k, _ in r.items()] == sorted(entries)


def test_named_subdb(tmp_path):
    with LMDBWriter(tmp_path / "db") as w:
        w.put(b"main_key", b"main_value")
        w.put(b"a", b"1", db=b"codes")
        w.put(b"b", b"2" * 5000, db=b"codes")
    with LMDBReader(tmp_path / "db") as r:
        assert r.get(b"main_key") == b"main_value"
        codes = r.open_db(b"codes")
        assert codes.entries == 2
        assert r.get(b"a", codes) == b"1"
        assert r.get(b"b", codes) == b"2" * 5000
        with pytest.raises(KeyError):
            r.open_db(b"nope")
        # sub-database nodes are skipped by main-db iteration values
        assert dict(r.items())[b"main_key"] == b"main_value"


def test_codes_dataset_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    rows = [CodeRow(top=rng.integers(0, 512, (4, 2)),
                    bottom=rng.integers(0, 512, (8, 4)),
                    attributes={"pitch": np.int64(60 + i)},
                    filename=f"note_{i}")
            for i in range(10)]
    write_codes_lmdb(tmp_path / "db", rows,
                     label_encoders={"pitch": [60, 61]})
    ds = LMDBCodesDataset(tmp_path / "db",
                          classes_for_conditioning=["pitch"])
    assert len(ds) == 10
    by_name = {r.filename: r for r in rows}
    keys = [k.decode() for k in ds._keys]
    assert keys == sorted(by_name)
    top, bottom, attrs = ds[keys.index("note_3")]
    np.testing.assert_array_equal(top, by_name["note_3"].top)
    np.testing.assert_array_equal(bottom, by_name["note_3"].bottom)
    assert attrs["pitch"].shape == (1,)
    assert int(attrs["pitch"][0]) == 63
    # label encoders blob survives in the main db
    with LMDBReader(tmp_path / "db") as r:
        assert pickle.loads(r.get(b"label_encoders")) == {
            "pitch": [60, 61]}


def test_open_codes_dataset_dispatch_and_read_batch(tmp_path):
    """open_codes_dataset picks the right backend and read_batch output
    matches the native mmap store's for the same rows."""
    from interactive_spectrogram_inpainting_tpu.data.codemap_store import (
        CodemapDataset, CodemapStoreWriter)
    from interactive_spectrogram_inpainting_tpu.data.label_encoders import (
        LabelEncoder, dump_label_encoders)
    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        open_codes_dataset)
    rng = np.random.default_rng(2)
    rows = [CodeRow(top=rng.integers(0, 512, (4, 2)),
                    bottom=rng.integers(0, 512, (8, 4)),
                    attributes={"pitch": np.int64(i % 3)},
                    filename=f"note_{i}")
            for i in range(6)]
    # native store
    with CodemapStoreWriter(tmp_path / "store", top_shape=(4, 2),
                            bottom_shape=(8, 4),
                            attribute_fields=["pitch"]) as w:
        for r in rows:
            w.append(r.top, r.bottom, {"pitch": int(r.attributes["pitch"])},
                     r.filename)
    # LMDB environment + the JSON encoders the reference dumps beside it
    write_codes_lmdb(tmp_path / "lmdb", rows)
    dump_label_encoders({"pitch": LabelEncoder([0, 1, 2])},
                        tmp_path / "lmdb" / "label_encoders.json")

    ds_store = open_codes_dataset(tmp_path / "store")
    ds_lmdb = open_codes_dataset(tmp_path / "lmdb")
    assert isinstance(ds_store, CodemapDataset)
    assert isinstance(ds_lmdb, LMDBCodesDataset)
    assert ds_lmdb.top_shape == (4, 2)
    assert ds_lmdb.bottom_shape == (8, 4)
    assert "pitch" in ds_lmdb.label_encoders
    idx = [0, 3, 5]
    t_s, b_s, a_s = ds_store.read_batch(idx)
    t_l, b_l, a_l = ds_lmdb.read_batch(idx)
    np.testing.assert_array_equal(t_s, t_l)
    np.testing.assert_array_equal(b_s, b_l)
    np.testing.assert_array_equal(a_s["pitch"], a_l["pitch"])
    with pytest.raises(FileNotFoundError):
        open_codes_dataset(tmp_path / "nothing")


def test_store_to_lmdb_conversion(tmp_path):
    """Native store -> LMDB conversion round-trips rows and encoders."""
    from interactive_spectrogram_inpainting_tpu.data.codemap_store import (
        CodemapStoreWriter)
    from interactive_spectrogram_inpainting_tpu.data.label_encoders import (
        LabelEncoder)
    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        store_to_lmdb)
    rng = np.random.default_rng(3)
    with CodemapStoreWriter(
            tmp_path / "store", top_shape=(4, 2), bottom_shape=(8, 4),
            attribute_fields=["pitch"],
            label_encoders={"pitch": LabelEncoder([60, 61])}) as w:
        tops = [rng.integers(0, 512, (4, 2)) for _ in range(4)]
        for i, top in enumerate(tops):
            w.append(top, rng.integers(0, 512, (8, 4)),
                     {"pitch": i % 2}, f"n_{i}")
    n = store_to_lmdb(tmp_path / "store", tmp_path / "lmdb")
    assert n == 4
    ds = LMDBCodesDataset(tmp_path / "lmdb",
                          classes_for_conditioning=["pitch"])
    assert len(ds) == 4
    top, _, attrs = ds[0]
    np.testing.assert_array_equal(top, tops[0])
    assert int(attrs["pitch"][0]) == 0
    assert "pitch" in ds.label_encoders


def test_reference_pickle_module_paths(tmp_path):
    """Rows pickled with the REFERENCE's CodeRow class path (what a
    reference-produced database contains) must load without the
    reference on sys.path."""
    import sys
    import types
    torch = pytest.importorskip("torch")
    ref_mod = ("interactive_spectrogram_inpainting.utils"
               ".datasets.lmdb_dataset")
    RefRow = namedtuple("CodeRow",
                        ["top", "bottom", "attributes", "filename"])
    RefRow.__module__ = ref_mod
    row = RefRow(top=np.arange(8).reshape(4, 2),
                 bottom=np.arange(32).reshape(8, 4),
                 attributes={"pitch": torch.tensor([5])},
                 filename="ref_note")
    # register the reference module path only to PRODUCE the pickle
    # bytes (a reference-made DB contains exactly this class path)
    registered = []
    parts = ref_mod.split(".")
    for i in range(1, len(parts) + 1):
        name = ".".join(parts[:i])
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            registered.append(name)
    sys.modules[ref_mod].CodeRow = RefRow
    try:
        blob = pickle.dumps(row)
    finally:
        for name in registered:
            del sys.modules[name]
    with LMDBWriter(tmp_path / "db") as w:
        w.put(b"ref_note", blob, db=b"codes")
    ds = LMDBCodesDataset(tmp_path / "db",
                          classes_for_conditioning=["pitch"])
    top, bottom, attrs = ds[0]
    np.testing.assert_array_equal(top, row.top)
    np.testing.assert_array_equal(bottom, row.bottom)
    assert int(attrs["pitch"][0]) == 5


def test_n_class_inference_random_sample_and_loud_failure(tmp_path):
    """n_class inference samples rows uniformly at random (not the
    head), and read_batch fails LOUDLY if a row carries a code >= the
    inferred vocabulary (out-of-range gathers clamp silently on TPU)."""
    rng = np.random.default_rng(2)
    # 600 rows (> the 512-row scan window); the large codes live ONLY in
    # the TAIL, so a head-biased scan would under-estimate n_class
    rows = [CodeRow(top=rng.integers(0, 8 if i < 550 else 500, (4, 2)),
                    bottom=rng.integers(0, 8, (8, 4)),
                    attributes={"pitch": np.int64(60)},
                    filename=f"note_{i:04d}")
            for i in range(600)]
    rows[-1] = CodeRow(top=np.full((4, 2), 499),
                       bottom=rows[-1].bottom,
                       attributes={"pitch": np.int64(60)},
                       filename="note_9999")
    write_codes_lmdb(tmp_path / "db", rows)
    ds = LMDBCodesDataset(tmp_path / "db",
                          classes_for_conditioning=["pitch"])
    # a uniform 512-of-600 sample misses the tail with prob ~(88/600)^50
    assert ds.n_class_top == 512
    # force a too-small estimate to exercise the batch-time guard
    ds._n_class_top = 8
    with pytest.raises(ValueError, match="pass --n_class"):
        ds.read_batch([599])


def test_validate_environment_on_writer_output(tmp_path):
    """Structural-invariant audit of everything the writer can emit:
    inline values, overflow chains, deep trees, named sub-dbs."""
    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        validate_environment)
    rng = np.random.default_rng(7)
    with LMDBWriter(tmp_path / "db", psize=512) as w:
        for i in range(500):
            w.put(f"{i:06d}".encode(), f"payload-{i}-".encode() * 4)
        for i in range(4):
            w.put(f"big{i}".encode(),
                  rng.integers(0, 255, 3000, dtype=np.uint8).tobytes())
        for i in range(60):
            w.put(f"code{i:03d}".encode(), b"v" * (i % 40), db=b"codes")
    stats = validate_environment(tmp_path / "db")
    assert stats["entries"] == 500 + 4 + 60 + 1  # +1 subdb record
    assert stats["dbs_checked"] == 2


def test_validate_environment_detects_corruption(tmp_path):
    """Flipping structural bytes must be caught (the audit is not a
    tautology of the writer)."""
    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        validate_environment)
    with LMDBWriter(tmp_path / "db") as w:
        for i in range(300):
            w.put(f"k{i:05d}".encode(), f"value-{i}".encode() * 6)
    blob = bytearray((tmp_path / "db" / "data.mdb").read_bytes())
    validate_environment(tmp_path / "db")  # pristine passes

    def corrupt(mutate, name):
        b = bytearray(blob)
        mutate(b)
        (tmp_path / "db" / "data.mdb").write_bytes(bytes(b))
        with pytest.raises(ValueError):
            validate_environment(tmp_path / "db")

    # swap two keys on a leaf page -> sort-order violation: find two
    # adjacent small keys in the raw bytes and exchange them
    i = bytes(blob).index(b"k00010")
    j = bytes(blob).index(b"k00011")
    corrupt(lambda b: (b.__setitem__(slice(i, i + 6), b"k00011"),
                       b.__setitem__(slice(j, j + 6), b"k00010")),
            "unsorted keys")
    # entries count off by one in the live meta's main MDB_db
    psize = 4096
    base = psize + 16 + 8 + 8 + 8 + 48  # meta1: hdr, magic.., free db
    corrupt(lambda b: b.__setitem__(base + 40, b[base + 40] ^ 1),
            "entries mismatch")
    # truncated file
    corrupt_b = bytearray(blob)[: len(blob) - psize]
    (tmp_path / "db" / "data.mdb").write_bytes(bytes(corrupt_b))
    with pytest.raises(ValueError):
        validate_environment(tmp_path / "db")
    (tmp_path / "db" / "data.mdb").write_bytes(bytes(blob))


def test_validate_environment_accepts_preallocated_tail(tmp_path):
    """Real liblmdb grows data.mdb past the last used page
    (pre-allocation / high-water); trailing unused pages must pass the
    default audit and fail only the strict_size opt-in (which is meant
    for this repo's own writer, which never over-allocates)."""
    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        validate_environment)
    with LMDBWriter(tmp_path / "db") as w:
        for i in range(50):
            w.put(f"k{i:04d}".encode(), f"v{i}".encode())
    path = tmp_path / "db" / "data.mdb"
    blob = path.read_bytes()
    validate_environment(tmp_path / "db", strict_size=True)
    # simulate liblmdb pre-allocation: append 8 zeroed pages
    path.write_bytes(blob + b"\x00" * (8 * 4096))
    stats = validate_environment(tmp_path / "db")
    assert stats["entries"] == 50
    with pytest.raises(ValueError, match="strict_size"):
        validate_environment(tmp_path / "db", strict_size=True)


def test_golden_pylmdb_fixture():
    """Read bytes REAL liblmdb produced (committed golden fixture).

    ``tests/fixtures/make_pylmdb_golden.py`` generates the fixture in
    any environment with the py-lmdb C binding (not installable in this
    image); once committed, this test validates ``LMDBReader`` and
    ``validate_environment`` against genuine liblmdb output — branch
    pages, overflow chains, a named sub-db, freelist entries from
    deletions, page reuse and a pre-allocated tail — in THIS image's
    CI, independent of this module's own writer."""
    import json
    import pathlib

    from interactive_spectrogram_inpainting_tpu.data.lmdb_compat import (
        validate_environment)

    fixture = pathlib.Path(__file__).parent / "fixtures" / "pylmdb_golden"
    if not (fixture / "data.mdb").exists():
        pytest.skip("golden py-lmdb fixture not generated yet (needs the "
                    "C binding: run tests/fixtures/make_pylmdb_golden.py "
                    "where py-lmdb exists and commit the output)")
    with open(fixture / "manifest.json") as f:
        manifest = json.load(f)
    stats = validate_environment(fixture)
    assert stats["entries"] >= len(manifest["main"])
    with LMDBReader(fixture) as r:
        for k, v_hex in manifest["main"].items():
            assert r.get(k.encode()) == bytes.fromhex(v_hex), k
        for k in manifest["deleted"]:
            assert r.get(k.encode()) is None, k
        sub = r.open_db(b"codes-subdb")
        for k, v_hex in manifest["subdb"].items():
            assert r.get(k.encode(), sub) == bytes.fromhex(v_hex), k
        # (r.keys() filters F_SUBDATA records, so the sub-db name entry
        # that lmdb stores in the main DB is not listed)
        assert sorted(r.keys()) == sorted(
            k.encode() for k in manifest["main"])


def test_cross_validation_against_py_lmdb(tmp_path):
    """Byte-level interop against REAL liblmdb, both directions — gated
    on the C binding's presence (not installable in this image; runs
    wherever py-lmdb exists). Advisor round 2: a shared misreading of
    the format by this module's reader AND writer would pass every
    self-round-trip; only real liblmdb can refute that."""
    lmdb = pytest.importorskip("lmdb")
    rng = np.random.default_rng(11)
    entries = {f"key{i:05d}".encode():
               rng.integers(0, 255, int(rng.integers(1, 6000)),
                            dtype=np.uint8).tobytes()
               for i in range(300)}

    # ours -> py-lmdb
    with LMDBWriter(tmp_path / "ours") as w:
        for k, v in entries.items():
            w.put(k, v)
        w.put(b"a", b"1", db=b"codes")
        w.put(b"b", b"2" * 5000, db=b"codes")
    env = lmdb.open(str(tmp_path / "ours"), max_dbs=4, readonly=True,
                    lock=False)
    with env.begin() as txn:
        for k, v in entries.items():
            assert txn.get(k) == v
    codes = env.open_db(b"codes")
    with env.begin() as txn:
        assert txn.get(b"a", db=codes) == b"1"
        assert txn.get(b"b", db=codes) == b"2" * 5000
        assert sum(1 for _ in txn.cursor()) == len(entries) + 1
    env.close()

    # py-lmdb -> ours
    env = lmdb.open(str(tmp_path / "theirs"), max_dbs=4,
                    map_size=1 << 26)
    sub = env.open_db(b"codes")
    with env.begin(write=True) as txn:
        for k, v in entries.items():
            txn.put(k, v)
        txn.put(b"x", b"y" * 9000, db=sub)
    env.close()
    with LMDBReader(tmp_path / "theirs") as r:
        for k, v in entries.items():
            assert r.get(k) == v
        assert r.get(b"x", r.open_db(b"codes")) == b"y" * 9000
