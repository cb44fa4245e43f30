// Minimal glog-compatible logging shim so the reference pbrt binary can be
// built as a correctness oracle without the (empty) src/ext/glog submodule.
// Implements exactly the surface the pbrt-v3 fork uses: LOG/VLOG streams,
// CHECK/CHECK_xx/DCHECK macros, google::InitGoogleLogging, and the FLAGS_*
// globals touched by src/main/pbrt.cpp:77-133 and src/tools/imgtool.cpp:765.
// Original code (not copied from glog).
#ifndef PBRT_ORACLE_GLOG_SHIM_H
#define PBRT_ORACLE_GLOG_SHIM_H

#include <cmath>
#include <cstdlib>
#include <iostream>
#include <sstream>
#include <string>

// ---- flags pbrt's main() sets ------------------------------------------
inline int FLAGS_stderrthreshold = 2;
inline int FLAGS_minloglevel = 0;
inline int FLAGS_v = 0;
inline bool FLAGS_logtostderr = false;
inline std::string FLAGS_log_dir;

namespace google {
inline void InitGoogleLogging(const char *) {}
inline void ShutdownGoogleLogging() {}
}  // namespace google

namespace pbrt_glog_shim {

enum Severity { INFO = 0, WARNING = 1, ERROR = 2, FATAL = 3 };

class LogMessage {
  public:
    LogMessage(Severity sev, const char *file, int line) : sev_(sev) {
        ss_ << "[" << "IWEF"[sev] << " " << file << ":" << line << "] ";
    }
    ~LogMessage()
#if __cplusplus >= 201103L
        noexcept(false)
#endif
    {
        if (sev_ >= FLAGS_minloglevel && sev_ >= FLAGS_stderrthreshold)
            std::cerr << ss_.str() << std::endl;
        if (sev_ == FATAL) std::abort();
    }
    std::ostream &stream() { return ss_; }

  private:
    Severity sev_;
    std::ostringstream ss_;
};

// swallows the stream when a condition holds (VLOG above verbosity, DCHECK
// in release builds)
class NullStream {
  public:
    template <typename T>
    NullStream &operator<<(const T &) { return *this; }
    NullStream &operator<<(std::ostream &(*)(std::ostream &)) {
        return *this;
    }
};

// evaluates the stream only so side effects match; voidify lets the macro
// appear in expression position like glog's
struct Voidify {
    void operator&(std::ostream &) {}
    void operator&(NullStream) {}
};

}  // namespace pbrt_glog_shim

#define LOG(sev) \
    ::pbrt_glog_shim::LogMessage(::pbrt_glog_shim::sev, __FILE__, __LINE__) \
        .stream()

#define VLOG(n)                                       \
    !(FLAGS_v >= (n))                                 \
        ? (void)0                                     \
        : ::pbrt_glog_shim::Voidify() &               \
              ::pbrt_glog_shim::LogMessage(           \
                  ::pbrt_glog_shim::INFO, __FILE__, __LINE__).stream()

#define CHECK(cond)                                                 \
    (cond) ? (void)0                                                \
           : ::pbrt_glog_shim::Voidify() &                          \
                 ::pbrt_glog_shim::LogMessage(::pbrt_glog_shim::FATAL, \
                                              __FILE__, __LINE__)     \
                     .stream()                                         \
                 << "Check failed: " #cond " "

#define CHECK_OP(a, b, op) CHECK((a)op(b)) << "(" #a " " #op " " #b ") "
#define CHECK_EQ(a, b) CHECK_OP(a, b, ==)
#define CHECK_NE(a, b) CHECK_OP(a, b, !=)
#define CHECK_LT(a, b) CHECK_OP(a, b, <)
#define CHECK_LE(a, b) CHECK_OP(a, b, <=)
#define CHECK_GT(a, b) CHECK_OP(a, b, >)
#define CHECK_GE(a, b) CHECK_OP(a, b, >=)
#define CHECK_NEAR(a, b, tol) CHECK(std::abs((a) - (b)) <= (tol))
#define CHECK_NOTNULL(p) (p)

#ifdef NDEBUG
#define DCHECK(cond) \
    true ? (void)0 : ::pbrt_glog_shim::Voidify() & ::pbrt_glog_shim::NullStream()
#define DCHECK_EQ(a, b) DCHECK((a) == (b))
#define DCHECK_NE(a, b) DCHECK((a) != (b))
#define DCHECK_LT(a, b) DCHECK((a) < (b))
#define DCHECK_LE(a, b) DCHECK((a) <= (b))
#define DCHECK_GT(a, b) DCHECK((a) > (b))
#define DCHECK_GE(a, b) DCHECK((a) >= (b))
#else
#define DCHECK(cond) CHECK(cond)
#define DCHECK_EQ(a, b) CHECK_EQ(a, b)
#define DCHECK_NE(a, b) CHECK_NE(a, b)
#define DCHECK_LT(a, b) CHECK_LT(a, b)
#define DCHECK_LE(a, b) CHECK_LE(a, b)
#define DCHECK_GT(a, b) CHECK_GT(a, b)
#define DCHECK_GE(a, b) CHECK_GE(a, b)
#endif

#endif  // PBRT_ORACLE_GLOG_SHIM_H
