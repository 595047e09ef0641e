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
	rm -rf .pytest_cache
	find rustyhgi_tpu tests -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
