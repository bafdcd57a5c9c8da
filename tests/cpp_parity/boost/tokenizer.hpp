// Minimal stand-in for boost::tokenizer — just enough to compile the
// reference libforest's CSVDataProvider in this environment (Boost is not
// installed; data.cpp:387-436 is its only user and the parity tests never
// call it). Implements the default escaped_list_separator semantics:
// comma separator, double-quote quoting, backslash escapes.
#pragma once
#include <string>
#include <vector>

namespace boost {

template <typename Char>
struct escaped_list_separator {};

template <typename Sep>
class tokenizer {
 public:
  explicit tokenizer(const std::string& line) {
    std::string cur;
    bool quoted = false, escaped = false, any = false;
    for (char c : line) {
      any = true;
      if (escaped) {
        cur += c;
        escaped = false;
      } else if (c == '\\') {
        escaped = true;
      } else if (c == '"') {
        quoted = !quoted;
      } else if (c == ',' && !quoted) {
        toks_.push_back(cur);
        cur.clear();
      } else {
        cur += c;
      }
    }
    if (any) toks_.push_back(cur);
  }
  using iterator = std::vector<std::string>::const_iterator;
  iterator begin() const { return toks_.begin(); }
  iterator end() const { return toks_.end(); }

 private:
  std::vector<std::string> toks_;
};

}  // namespace boost
