from unmixing_spark.lsma.fcls import fcls_abundance, nnls_multiple  # noqa: F401
