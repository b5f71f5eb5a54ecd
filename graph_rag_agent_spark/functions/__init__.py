"""Pure deterministic kernels shared by the Spark UDFs and the pure-Python
reference oracle. Nothing in here touches Spark — that's what makes the
P/R differential test meaningful."""
