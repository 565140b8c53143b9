# Convenience targets — counterpart of the reference's Makefile
# (reference model/Makefile:1-31: build/train_cvusa/test_cvusa/train_witw/
# test_witw with DATA/FOV env vars). DATA mounts the dataset directory.
DATA ?= ./data
FOV ?= 360
IMAGE ?= witw-tpu

.PHONY: build native test bench train_cvusa test_cvusa train_witw test_witw parity

# Recall-parity gate vs the reference's trained weights (BASELINE.md):
#   make parity DATA=/path/to/cvusa WEIGHTS=/path/to/reference/weights \
#               [REF_METRICS=ref.json] [FOV=360]
WEIGHTS ?= ./weights
REF_METRICS ?=
parity:
	python -m witw_tpu.tools.parity --dataset cvusa --fov $(FOV) \
	    --test-csv $(DATA)/val-19zl.csv \
	    --surface-pth $(WEIGHTS)/fov_$(FOV)_surface_best.pth \
	    --overhead-pth $(WEIGHTS)/fov_$(FOV)_overhead_best.pth \
	    $(if $(REF_METRICS),--reference-metrics $(REF_METRICS),)

native:
	$(MAKE) -C witw_tpu/native

build:
	docker build -t $(IMAGE) .

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

train_cvusa:
	python -m witw_tpu.cli.cvig_fov --mode train --dataset cvusa --fov $(FOV) \
	    --train-csv $(DATA)/train-19zl.csv --test-csv $(DATA)/val-19zl.csv

test_cvusa:
	python -m witw_tpu.cli.cvig_fov --mode test --dataset cvusa --fov $(FOV) \
	    --train-csv $(DATA)/train-19zl.csv --test-csv $(DATA)/val-19zl.csv

train_witw:
	python -m witw_tpu.cli.cvig_fov --mode train --dataset witw --fov $(FOV) \
	    --train-csv $(DATA)/train.csv --test-csv $(DATA)/test.csv

test_witw:
	python -m witw_tpu.cli.cvig_fov --mode test --dataset witw --fov $(FOV) \
	    --train-csv $(DATA)/train.csv --test-csv $(DATA)/test.csv
