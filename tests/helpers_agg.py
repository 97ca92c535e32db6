"""Custom aggregator target for the module:function late-binding test
(the reference resolves any ``module:function`` via get_entrypoint,
memorious/logic/crawler.py:66-81)."""


def count_to_file(spark, store, results, params):
    path = params["path"]
    n = 0 if results is None else results.count()
    with open(path, "w") as fh:
        fh.write(str(n))
    return path
