# Top-level convenience targets.

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C tracer/bvh/native
	$(MAKE) -C tracer/io/native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

clean:
	$(MAKE) -C tracer/bvh/native clean
	$(MAKE) -C tracer/io/native clean
