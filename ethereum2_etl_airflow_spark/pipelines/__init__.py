"""End-to-end operator compositions (the "run your whole pipeline"
surface): each pipeline chains the public operators into one logical
DataFrame plan, so Catalyst optimizes across stage boundaries and the
composition itself is oracle-checkable."""
