# Dev entry points.
.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C dawnsearch_tpu/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C dawnsearch_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
