# Top-level targets (reference parity: /root/reference/Makefile)

.PHONY: docs native test bench clean

docs:
	JAX_PLATFORMS=cpu TF_CPP_MIN_LOG_LEVEL=3 python docs/gen_api.py

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf docs/api
	$(MAKE) -C native clean
