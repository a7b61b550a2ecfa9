from setuptools import find_packages, setup

setup(
    name="syzgy-tpu-client",
    version="0.1.0",
    description="Typed REST client for the syzgydb_tpu vector database",
    packages=find_packages(),
    python_requires=">=3.9",
    install_requires=[],  # stdlib only
)
