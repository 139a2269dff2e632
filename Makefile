# Developer entry points (see README.md / docs/)

.PHONY: test test-fast bench entry multichip native templates clean

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow" -k "not e2e and not workflow"

bench:
	python bench.py

entry:
	python __graft_entry__.py

multichip:
	python __graft_entry__.py multichip 8

native:
	g++ -O2 -shared -fPIC -std=c++17 lipvq_tpu/native/bpe.cpp -o lipvq_tpu/native/libbpe.so

templates:
	python -m lipvq_tpu.scripts.generate_config_templates

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f lipvq_tpu/native/libbpe.so
