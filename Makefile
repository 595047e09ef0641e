# Convenience targets for the rustyhgi_tpu framework.

.PHONY: test native bench clean

test: native
	JAX_PLATFORMS=cpu python -m pytest tests/ -q

native:
	$(MAKE) -C native -s

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache rustyhgi_tpu/**/__pycache__ tests/__pycache__
