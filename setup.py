from setuptools import find_packages, setup

setup(
    name="syzgydb-tpu",
    version="0.1.0",
    description="TPU-native embeddable vector database "
                "(SyzgyDB-compatible API)",
    packages=find_packages(exclude=("tests",)),
    package_data={"syzgydb_tpu.native": ["libspanlog_core.so"]},
    python_requires=">=3.10",
    install_requires=["jax", "numpy", "flax"],
    entry_points={
        "console_scripts": ["syzgy-tpu=syzgydb_tpu.tools.cli:main"],
    },
)
