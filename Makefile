# CLI entry points (reference Makefile:1-38). No torchrun switch needed:
# GSPMD data parallelism uses every local device in one process.

CONFIG ?=
OVERRIDES ?=
CFG_ARG := $(if $(CONFIG),--config $(CONFIG),)

# reference `make main`: train -> export -> bench
main:
	$(MAKE) train
	$(MAKE) export
	$(MAKE) bench

split:
	python -m custom_d_fine_tpu.cli.split $(CFG_ARG) $(OVERRIDES)

train:
	python -m custom_d_fine_tpu.cli.train $(CFG_ARG) $(OVERRIDES)

export:
	python -m custom_d_fine_tpu.cli.export $(CFG_ARG) $(OVERRIDES)

bench:
	python -m custom_d_fine_tpu.cli.bench $(CFG_ARG) $(OVERRIDES)

bench_loader:
	python tools/bench_loader.py

infer:
	python -m custom_d_fine_tpu.cli.infer $(CFG_ARG) $(OVERRIDES)

check_errors:
	python -m custom_d_fine_tpu.cli.check_errors $(CFG_ARG) $(OVERRIDES)

quantize_int8:
	python -m custom_d_fine_tpu.cli.quantize_int8 $(CFG_ARG) $(OVERRIDES)

demo:
	python -m custom_d_fine_tpu.cli.demo $(CFG_ARG) $(OVERRIDES)

test_batching:
	python -m custom_d_fine_tpu.cli.test_batching $(CFG_ARG) $(OVERRIDES)

test:
	python -m pytest tests/ -x -q

# reference alias (ov_int8 -> the TPU int8 path)
ov_int8: quantize_int8

.PHONY: main split train export bench bench_loader infer check_errors test_batching quantize_int8 ov_int8 demo test
