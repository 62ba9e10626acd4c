PY ?= python

.PHONY: test test-fast native bench figures clean

test:
	$(PY) -m pytest tests/ -q

# Fast tier: everything not marked slow (~2 min serial on CPU); the full
# `make test` tier (~10 min) is the merge gate.
test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

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
