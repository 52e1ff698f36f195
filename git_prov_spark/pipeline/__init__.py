"""Spark dataflow stages: changelog (J4), versions (W1-W3), agents (J1/A1),
diff stats (A4), statement emission (P1-P5/J2), end-to-end build."""
