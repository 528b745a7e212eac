

def test_fd_audit_holds_and_violations(spark):
    from anomalydetection_spark.operators.uniqueness import fd_audit

    df = spark.createDataFrame(
        [
            ("u1", "US", "a"),
            ("u1", "US", "b"),     # same country twice: FD fine
            ("u2", "FR", "c"),
            ("u2", "DE", "d"),     # u2 forks country: FD violated
            ("u3", None, "e"),     # NULL-only dependent: not a violation
        ],
        "user string, country string, x string",
    )
    r = fd_audit(df, "user", "country").collect()[0]
    assert (r["determinant"], r["dependent"]) == ("user", "country")
    assert r["n_keys"] == 3 and r["n_violating_keys"] == 1
    assert r["max_distinct"] == 2 and not r["fd_holds"]

    ok = fd_audit(df, "x", "user").collect()[0]
    assert ok["fd_holds"] and ok["n_violating_keys"] == 0
