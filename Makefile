# Build / run targets (reference: /root/reference/Makefile)

PYTHON ?= python

.PHONY: all native test bench serve docker deb clean

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

# Installable packages (reference Makefile:30-63 fpm deb/rpm analog).
# deb builds here with dpkg-deb; rpm needs rpmbuild (spec provided).
deb:
	bash packaging/build_deb.sh

rpm:
	rpmbuild -bb --build-in-place packaging/syzgy-tpu.spec

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
