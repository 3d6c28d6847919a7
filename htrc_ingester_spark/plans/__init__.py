"""Query plans: the flagship spatial pipeline and the operator catalog
backing the driver contract (__spark_entry__.py)."""
