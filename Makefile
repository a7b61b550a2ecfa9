# Build / run targets (reference: /root/reference/Makefile)

PYTHON ?= python

.PHONY: all native test bench serve docker clean

all: native

native:
	$(MAKE) -C native

test: native
	$(PYTHON) -m pytest tests/ -x -q

bench: native
	$(PYTHON) bench.py

serve: native
	$(PYTHON) -m syzgydb_tpu.tools.cli --serve

docker:
	docker build -t syzgydb-tpu .

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
