# Convenience targets mirroring the reference's Makefile interface
# (reference: Makefile:18-28 — `make run-<dataset>` with tuned parameters).
# No build step: the framework is JAX; the optional native loader builds
# itself on first use (csrc/loader.cpp via ctypes).

PY ?= python

.PHONY: test run-cora run-citeseer run-pubmed run-reddit run-products bench perf accuracy \
        tuning layout golden scaling plots native clean

test:
	$(PY) -m pytest tests/ -x -q

run-cora:
	$(PY) -m parallel_gcn_tpu cora

run-citeseer:
	$(PY) -m parallel_gcn_tpu citeseer

# pubmed/reddit feature blobs are not shipped; these run the stand-ins
# (synth-pubmed = real graph + synthetic features; synth-reddit = generated)
run-pubmed:
	$(PY) -m parallel_gcn_tpu synth-pubmed

run-reddit:
	$(PY) -m parallel_gcn_tpu synth-reddit

# beyond-reference scale demo (ogbn-products scale, 2.45M nodes / 126M edges)
run-products:
	$(PY) -m parallel_gcn_tpu synth-products

bench:
	$(PY) bench.py

perf:
	$(PY) harness/performance.py

accuracy:
	$(PY) harness/accuracy.py

tuning:
	$(PY) harness/tuning.py cora --preset fine

layout:
	$(PY) harness/tuning_layout.py synth-pubmed

golden:
	$(PY) harness/performance_golden.py

plots:
	$(PY) harness/plots.py

scaling:
	$(PY) harness/scaling.py synth-medium --devices 1,2,4,8

native:
	$(MAKE) -C csrc

clean:
	rm -rf output .pytest_cache parallel_gcn_tpu/data/_native*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
