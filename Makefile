# Developer entry points (counterpart of the reference Makefile + CI scripts)

.PHONY: test test-fast bench dryrun install native apidocs clean

apidocs:
	python scripts/gen_api_docs.py

install:
	pip3 install -e .

native:
	$(MAKE) -C physicl_tpu/utils/native

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

dryrun:
	python __graft_entry__.py dryrun 8

clean:
	rm -rf build dist *.egg-info physicl_tpu/utils/native/*.so
	find . -name __pycache__ -type d -exec rm -rf {} +
