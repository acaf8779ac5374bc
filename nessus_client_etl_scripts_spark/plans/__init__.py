"""Query plans: the public query API (Nessus stored-procedure
analogues) and the declared testdata query registry used by the
driver's oracle-differential harness."""
