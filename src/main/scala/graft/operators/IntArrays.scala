package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * intarray query_int `@@` matching (ref: /root/reference/contrib/
 * intarray/_int_bool.cpp — a boolean query over set membership:
 * `1 & (2 | 3)` matches arrays containing 1 and either 2 or 3; `!`
 * negates membership; precedence ! > & > |). Compiles to
 * array_contains combinations — pure codegen, evaluated in one scan;
 * the GIN acceleration path for a query TABLE is the postings
 * equi-join shape ([[Trgm.searchMany]] device keyed by value).
 */
object IntArrays {
  def queryIntMatch(arr: Column, q: String): Column = {
    sealed trait N
    case class Atom(v: Int) extends N
    case class Not(n: N) extends N
    case class And(l: N, r: N) extends N
    case class Or(l: N, r: N) extends N
    val toks = q.replace("(", " ( ").replace(")", " ) ")
      .replace("&", " & ").replace("|", " | ").replace("!", " ! ")
      .trim.split("\\s+").filter(_.nonEmpty).toList
    var rest = toks
    def parseOr(): N = {
      var n = parseAnd()
      while (rest.headOption.contains("|")) { rest = rest.tail; n = Or(n, parseAnd()) }
      n
    }
    def parseAnd(): N = {
      var n = parseUn()
      while (rest.headOption.contains("&")) { rest = rest.tail; n = And(n, parseUn()) }
      n
    }
    def parseUn(): N = rest match {
      case "!" :: t => rest = t; Not(parseUn())
      case "(" :: t =>
        rest = t; val n = parseOr()
        require(rest.headOption.contains(")"), s"graft: unbalanced query_int: $q")
        rest = rest.tail; n
      case w :: t =>
        require(w.matches("-?[0-9]+"), s"graft: bad query_int atom: $w")
        rest = t; Atom(w.toInt)
      case Nil => throw new IllegalArgumentException(s"graft: empty query_int: $q")
    }
    val tree = parseOr()
    require(rest.isEmpty, s"graft: trailing query_int tokens: $rest")
    def compile(n: N): Column = n match {
      case Atom(v) => array_contains(arr, v)
      case Not(x) => !compile(x)
      case And(l, r) => compile(l) && compile(r)
      case Or(l, r) => compile(l) || compile(r)
    }
    compile(tree)
  }
}
