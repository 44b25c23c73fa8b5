#!/bin/bash
# Build the reference ICICLE CPU backend (from /root/reference) into
# /tmp/icicle_build for golden-vector testing (tests/ref_ffi.py).
# Taskflow is unavailable offline; a serial API-compatible stub is generated.
set -e
FIELD=${1:-babybear}
# curves use -DCURVE=<name>; fields use -DFIELD=<name> (reference cmake/features.cmake)
case "$FIELD" in
  bn254|bls12_381|bls12_377|bw6_761|grumpkin) TARGET_FLAG="-DCURVE=$FIELD" ;;
  *) TARGET_FLAG="-DFIELD=$FIELD" ;;
esac
STUB=/tmp/taskflow_stub
BUILD=${ICICLE_REF_BUILD:-/tmp/icicle_build}

mkdir -p $STUB/include/taskflow/{core,algorithm,utility} $STUB/cmake
cat > $STUB/include/taskflow/taskflow.hpp <<'EOF'
// Minimal serial drop-in for the Taskflow subset used by icicle's CPU backend
// (emplace/clear + Executor::run(...).wait()). Correctness-only; no threading.
#pragma once
#include <functional>
#include <utility>
#include <vector>

namespace tf {

class Task {
 public:
  template <typename... Ts> Task& precede(Ts&&...) { return *this; }
  template <typename... Ts> Task& succeed(Ts&&...) { return *this; }
  Task& name(const char*) { return *this; }
};

class Taskflow {
 public:
  template <typename F>
  Task emplace(F&& f) {
    tasks_.emplace_back(std::forward<F>(f));
    return Task{};
  }
  void clear() { tasks_.clear(); }
  std::vector<std::function<void()>>& tasks() { return tasks_; }

 private:
  std::vector<std::function<void()>> tasks_;
};

class Future {
 public:
  void wait() {}
  void get() {}
};

class Executor {
 public:
  explicit Executor(unsigned = 1) {}
  Future run(Taskflow& tf) {
    for (auto& t : tf.tasks()) t();
    return Future{};
  }
  template <typename F> void silent_async(F&& f) { f(); }
  void join() {}
  int num_workers() const { return 1; }
};

}  // namespace tf
EOF
for h in core/executor.hpp core/taskflow.hpp core/task.hpp core/async.hpp \
         core/flow_builder.hpp core/worker.hpp utility/traits.hpp \
         algorithm/for_each.hpp algorithm/reduce.hpp algorithm/transform.hpp; do
  printf '#pragma once\n#include "taskflow/taskflow.hpp"\n' > $STUB/include/taskflow/$h
done
cat > $STUB/cmake/TaskflowConfig.cmake <<EOF
add_library(Taskflow::Taskflow INTERFACE IMPORTED)
set_target_properties(Taskflow::Taskflow PROPERTIES
  INTERFACE_INCLUDE_DIRECTORIES "$STUB/include")
set(Taskflow_VERSION 3.8.0)
EOF
cat > $STUB/cmake/TaskflowConfigVersion.cmake <<'EOF'
set(PACKAGE_VERSION "3.8.0")
set(PACKAGE_VERSION_EXACT TRUE)
set(PACKAGE_VERSION_COMPATIBLE TRUE)
EOF

mkdir -p $BUILD
cmake -S /root/reference/icicle -B $BUILD -DCPU_BACKEND=ON "$TARGET_FLAG" \
  -DCMAKE_BUILD_TYPE=Release -DTaskflow_DIR=$STUB/cmake -GNinja
cmake --build $BUILD -j"$(nproc)"
ls $BUILD/*.so
