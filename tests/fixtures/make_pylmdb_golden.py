"""Generate the real-liblmdb golden fixture for ``test_lmdb_compat``.

Run this script in ANY environment where the py-lmdb C binding is
installed (it is not installable in the build image — no egress, no
wheel — so the fixture must be produced out-of-band and committed):

    python tests/fixtures/make_pylmdb_golden.py

It writes ``tests/fixtures/pylmdb_golden/data.mdb`` plus a
``manifest.json`` describing every entry, using a fixed seed so the
fixture is reproducible. The contents deliberately exercise format
features beyond what :class:`lmdb_compat.LMDBWriter` emits itself:

- enough inline entries to force branch pages (a multi-level B+tree),
- three overflow chains (values of 1, 2 and 5 pages),
- a named sub-database,
- deletions (populating the FREE_DBI freelist),
- an entry re-written in a later transaction (page reuse), and
- liblmdb's pre-allocated file tail (map_size > used pages).

``tests/test_lmdb_compat.py::test_golden_pylmdb_fixture`` consumes the
committed fixture: ``LMDBReader`` must return every manifest entry
byte-exactly and ``validate_environment`` must pass. That test is the
independent check round-2/round-3 advisors asked for — a shared
misreading of the format by this repo's reader AND writer cannot
survive bytes that real liblmdb produced.

Reference consumer of the format: the upstream dataset loader
(``/root/reference`` ``utils/datasets/lmdb_dataset.py:34-45``).
"""
import hashlib
import json
import pathlib
import sys


def deterministic_bytes(tag: str, length: int) -> bytes:
    out = bytearray()
    counter = 0
    while len(out) < length:
        out.extend(hashlib.sha256(f"{tag}:{counter}".encode()).digest())
        counter += 1
    return bytes(out[:length])


def build(out_dir: pathlib.Path) -> dict:
    import lmdb  # the REAL C binding — the whole point of the fixture

    out_dir.mkdir(parents=True, exist_ok=True)
    env = lmdb.open(str(out_dir), map_size=4 * 1024 * 1024, subdir=True,
                    max_dbs=4, writemap=False)
    manifest = {"main": {}, "subdb": {}, "deleted": []}

    # txn 1: bulk inline entries (forces branch pages at psize 4096)
    with env.begin(write=True) as txn:
        for i in range(400):
            k = f"key{i:05d}".encode()
            v = deterministic_bytes(f"v{i}", 40 + (i % 7) * 13)
            txn.put(k, v)
            manifest["main"][k.decode()] = v.hex()

    # txn 2: overflow values (1, 2 and 5 pages) + a named sub-db
    with env.begin(write=True) as txn:
        for pages, tag in ((1, "ov1"), (2, "ov2"), (5, "ov5")):
            k = f"overflow-{tag}".encode()
            v = deterministic_bytes(tag, pages * 4096 - 100)
            txn.put(k, v)
            manifest["main"][k.decode()] = v.hex()
    sub = env.open_db(b"codes-subdb")
    with env.begin(write=True) as txn:
        for i in range(50):
            k = f"sub{i:03d}".encode()
            v = deterministic_bytes(f"s{i}", 25)
            txn.put(k, v, db=sub)
            manifest["subdb"][k.decode()] = v.hex()

    # txn 3: deletions (freelist) + a rewrite (page reuse)
    with env.begin(write=True) as txn:
        for i in range(100, 140):
            k = f"key{i:05d}".encode()
            txn.delete(k)
            del manifest["main"][k.decode()]
            manifest["deleted"].append(k.decode())
        k, v = b"key00007", deterministic_bytes("rewrite", 64)
        txn.put(k, v)
        manifest["main"][k.decode()] = v.hex()

    env.sync(True)
    env.close()
    # drop the reader lockfile — only data.mdb is the format under test
    lock = out_dir / "lock.mdb"
    if lock.exists():
        lock.unlink()
    manifest["lmdb_version"] = lmdb.version()
    return manifest


def main():
    out_dir = pathlib.Path(__file__).parent / "pylmdb_golden"
    manifest = build(out_dir)
    with open(out_dir / "manifest.json", "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    print(f"wrote {out_dir}/data.mdb "
          f"({(out_dir / 'data.mdb').stat().st_size} bytes), "
          f"{len(manifest['main'])} main + {len(manifest['subdb'])} subdb "
          f"entries, liblmdb {manifest['lmdb_version']}")


if __name__ == "__main__":
    sys.exit(main())
