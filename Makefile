# Convenience targets; the framework itself is pure Python + a
# build-on-first-use C++ decoder (no build step required).

.PHONY: test test-fast bench dryrun native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" --ignore=tests/test_cli.py

bench:
	python bench.py

dryrun:
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

native:  # force-rebuild the C++ decoder
	rm -f mcm_tpu/runtime/_libmcmdecoder.so
	python -c "from mcm_tpu.runtime.native import native_available; \
	           assert native_available(), 'decoder build failed'"

clean:
	rm -rf results img_templates .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
