# blama-tpu developer entry points

.PHONY: test bench native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# Explicit native-library build (normally self-bootstrapped on first use)
native:
	c++ -O3 -shared -fPIC -std=c++17 -march=native -pthread \
	    native/blama_native.cpp -o native/libblama_native.so

clean:
	rm -rf .jax_cache .jax_cache_tpu native/libblama_native.so \
	    $$HOME/.cache/blama_tpu
