PY ?= python

.PHONY: test test-fast native bench figures clean

# Full suite = the merge gate: 303 tests, measured 3:42 with 4 xdist
# workers and a warm /tmp/tq_test_jax_cache (round 5 on the 2-CPU rig;
# workers mostly wait on XLA:CPU compiles, so -n 4 > nproc still wins).
# The round-5 cut from 4:48 came from skipping the HESE plane math in
# degenerate-budget calibration (layers/quantize.py).  Cold cache adds
# ~4 min of one-time compiles.  TQ_TEST_CACHE_DIR=0 disables the
# persistent cache.
test:
	$(PY) -m pytest tests/ -q -n 4

# Fast tier: everything not marked slow (measured 1:04 warm with -n 4;
# 3:20 serial).
test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow" -n 4

native:
	$(MAKE) -C native

bench:
	$(PY) bench.py
	$(PY) bench.py matmul
	$(PY) bench.py resnet

figures:
	$(PY) -m tq_tpu.viz.fpga
	-$(PY) -m tq_tpu.viz.pareto results/mnist-quant.json results/mnist-tr.json --pair --out figures/mnist_pareto.pdf
	-$(PY) -m tq_tpu.viz.pareto results/lstm-quant.json results/lstm-tr.json --pair --out figures/lstm_pareto.pdf
	-$(PY) -m tq_tpu.viz.pareto results/resnet18-results.json results/vgg16_bn-results.json results/mobilenet_v2-results.json results/efficientnet_b0-results.json
	-$(PY) -m tq_tpu.viz.group_size results/resnet18-group-size-results.json
	-$(PY) -m tq_tpu.viz.quant_error
	-$(PY) -m tq_tpu.viz.term_dist

clean:
	rm -rf native/build .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
