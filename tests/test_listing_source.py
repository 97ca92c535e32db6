"""Directory-listing source (ftp_fetch / dav_index pattern,
memorious/operations/ftp.py:13-51, webdav.py:14-38)."""

import hashlib

from memorious_spark.sources.listing_source import listing_source, retrieve_files

TREE = {
    "/root": [
        {"name": "a.txt", "is_dir": False, "size": 3},
        {"name": "sub", "is_dir": True},
    ],
    "/root/sub": [
        {"name": "b.txt", "is_dir": False, "size": 5},
        {"name": "loop", "is_dir": True},
    ],
    # cycle back to an already-listed folder — must not recurse forever
    "/root/sub/loop": [{"name": "c.bin", "is_dir": False, "size": 1}],
}


def test_listing_walks_tree(spark):
    def lister(path):
        return TREE.get(path, [])

    df = listing_source(spark, lister, ["/root"])
    rows = {r["path"]: r for r in df.collect()}
    assert set(rows) == {"/root/a.txt", "/root/sub/b.txt", "/root/sub/loop/c.bin"}
    assert rows["/root/sub/b.txt"]["depth"] == 1
    assert rows["/root/sub/loop/c.bin"]["depth"] == 2
    assert rows["/root/a.txt"]["size"] == 3


def test_listing_spools_out_of_core(spark, tmp_path):
    """spool_dir bounds driver memory: rows flush to parquet parts in
    batches and the result reads back identical to the in-memory path."""
    def lister(path):
        return TREE.get(path, [])

    spool = tmp_path / "spool"
    df = listing_source(
        spark, lister, ["/root"], spool_dir=str(spool), spool_batch=1
    )
    rows = {r["path"]: r["size"] for r in df.collect()}
    assert rows == {
        "/root/a.txt": 3, "/root/sub/b.txt": 5, "/root/sub/loop/c.bin": 1,
    }
    # batch=1 → one part per file row
    assert len(list(spool.glob("part-*.parquet"))) == 3


def test_retrieve_files_parallel(spark):
    def lister(path):
        return TREE.get(path, [])

    def retriever(path):
        if path.endswith("c.bin"):
            raise IOError("transfer failed")
        return f"body of {path}".encode()

    listed = listing_source(spark, lister, ["/root"])
    got = {r["path"]: r for r in retrieve_files(listed, retriever).collect()}
    body = b"body of /root/a.txt"
    assert bytes(got["/root/a.txt"]["payload"]) == body
    assert got["/root/a.txt"]["content_hash"] == hashlib.sha1(body).hexdigest()
    assert got["/root/a.txt"]["n_bytes"] == len(body)
    # failed transfer → null payload, row survives
    assert got["/root/sub/loop/c.bin"]["payload"] is None


def test_listing_spool_empty_tree_returns_empty_df(spark, tmp_path):
    """Zero files listed with spool_dir set: no parquet part is ever
    flushed — must return an empty DF like the in-memory path, not
    raise PATH_NOT_FOUND on the unreadable spool dir."""
    df = listing_source(
        spark, lambda path: [], ["/root"], spool_dir=str(tmp_path / "sp")
    )
    assert df.count() == 0
    assert df.columns == ["path", "parent", "depth", "size"]
