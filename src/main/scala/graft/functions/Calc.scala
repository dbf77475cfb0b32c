package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The calculator expression language: parser + validator + compiler to
  * a Catalyst [[Column]].
  *
  * Mirrors the reference's formula language
  * (/root/reference/streamtasks/system/tasks/calculator.py:17-134):
  * ternary `c ? a : b`, comparisons `> < >= <= == !=`, logic `& | ^`,
  * arithmetic `+ - * / % **`, unary `- + !`, function calls, constants
  * `pi`/`e`. Everything is a Double; booleans are floats thresholded at
  * 0.5 (calculator.py:103-116): logic/comparison ops *produce* 1.0/0.0
  * and *consume* truthiness as `x > 0.5`.
  *
  * Semantic fidelity notes:
  *  - `%` is Python modulo (sign of the divisor) → `((a % b) + b) % b`;
  *  - `round` is Python's banker's rounding → Spark `bround`
  *    (HALF_EVEN), not `round` (HALF_UP);
  *  - `floor`/`ceil` return doubles (the reference stays in float);
  *  - `**` is left-associative, matching the reference grammar
  *    (`?exp: atom | exp "**" atom`, calculator.py:46-47) — NOT
  *    Python's right-associative `**`;
  *  - validation (unknown variables/functions, reserved names) happens
  *    at analysis time like `CalculatorConfig.validate_formula`
  *    (calculator.py:168-188).
  *
  * The compiled Column is pure built-in Catalyst expressions — it
  * inlines into whole-stage codegen, so a formula over a 100 TB scan
  * runs as generated JVM bytecode with no interpretation overhead.
  */
object Calc {

  // ---------------------------------------------------------------- AST
  sealed trait Ast
  final case class Num(v: Double) extends Ast
  final case class Vari(name: String) extends Ast
  final case class Un(op: String, a: Ast) extends Ast
  final case class Bin(op: String, l: Ast, r: Ast) extends Ast
  final case class Iff(c: Ast, t: Ast, f: Ast) extends Ast
  final case class Call(fn: String, args: List[Ast]) extends Ast

  val constants: Map[String, Double] = Map("pi" -> math.Pi, "e" -> math.E)

  val functions: Set[String] = Set(
    "sin", "cos", "tan", "asin", "acos", "atan", "atan2",
    "sinh", "cosh", "tanh", "asinh", "acosh", "atanh",
    "log", "log2", "log10", "exp", "sqrt", "floor", "ceil",
    "round", "abs", "min", "max")

  // ---------------------------------------------------------- tokenizer
  private sealed trait Tok
  private final case class TNum(v: Double) extends Tok
  private final case class TName(s: String) extends Tok
  private final case class TOp(s: String) extends Tok

  private val opTokens = // longest first so ** beats *, >= beats >
    List("**", ">=", "<=", "==", "!=", "?", ":", ">", "<", "&", "|", "^",
      "+", "-", "*", "/", "%", "!", "(", ")", ",")

  private def tokenize(s: String): List[Tok] = {
    val out = List.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || c == '.') {
        val j = s.indexWhere(ch => !(ch.isDigit || ch == '.' || ch == 'e' ||
          ch == 'E'), i) match { case -1 => s.length; case x => x }
        // keep exponent sign: "1e-3"
        var k = j
        if (k < s.length && (s(k) == '+' || s(k) == '-') &&
          (s(k - 1) == 'e' || s(k - 1) == 'E')) {
          k = s.indexWhere(ch => !ch.isDigit, k + 1) match {
            case -1 => s.length; case x => x }
        }
        out += TNum(s.substring(i, k).toDouble); i = k
      } else if (c.isLetter || c == '_') {
        val j = s.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i) match {
          case -1 => s.length; case x => x }
        out += TName(s.substring(i, j)); i = j
      } else opTokens.find(op => s.startsWith(op, i)) match {
        case Some(op) => out += TOp(op); i += op.length
        case None => throw new IllegalArgumentException(
          s"calc: unexpected character '$c' at $i in: $s")
      }
    }
    out.result()
  }

  // ------------------------------------------------------------- parser
  /** Precedence climbing over the reference grammar's levels
    * (calculator.py:17-64, lowest to highest):
    * ternary < comparisons < (& | ^) < (+ -) < (* / %) < ** < unary. */
  def parse(formula: String): Ast = {
    var toks = tokenize(formula)
    def peek: Option[Tok] = toks.headOption
    def pop(): Tok = toks match {
      case t :: rest => toks = rest; t
      case Nil => throw new IllegalArgumentException(
        s"calc: unexpected end of formula: $formula")
    }
    def expect(op: String): Unit = pop() match {
      case TOp(`op`) => ()
      case t => throw new IllegalArgumentException(s"calc: expected '$op', got $t")
    }

    def pExpr(): Ast = {
      val c = pCmp()
      peek match {
        case Some(TOp("?")) =>
          pop(); val t = pExpr(); expect(":"); val f = pExpr(); Iff(c, t, f)
        case _ => c
      }
    }
    def binLevel(ops: Set[String], next: () => Ast): () => Ast = () => {
      var l = next()
      var continue = true
      while (continue) peek match {
        case Some(TOp(o)) if ops(o) => pop(); l = Bin(o, l, next())
        case _ => continue = false
      }
      l
    }
    lazy val pCmp: () => Ast = binLevel(Set(">", "<", ">=", "<=", "==", "!="), () => pLogic())
    lazy val pLogic: () => Ast = binLevel(Set("&", "|", "^"), () => pSum())
    lazy val pSum: () => Ast = binLevel(Set("+", "-"), () => pProd())
    lazy val pProd: () => Ast = binLevel(Set("*", "/", "%"), () => pPow())
    lazy val pPow: () => Ast = binLevel(Set("**"), () => pUnary())
    def pUnary(): Ast = peek match {
      case Some(TOp(o @ ("-" | "+" | "!"))) => pop(); Un(o, pUnary())
      case _ => pAtom()
    }
    def pAtom(): Ast = pop() match {
      case TNum(v) => Num(v)
      case TName(n) => peek match {
        case Some(TOp("(")) =>
          pop()
          val args = List.newBuilder[Ast]
          if (peek != Some(TOp(")"))) {
            args += pExpr()
            while (peek == Some(TOp(","))) { pop(); args += pExpr() }
          }
          expect(")")
          Call(n, args.result())
        case _ => Vari(n)
      }
      case TOp("(") => val e = pExpr(); expect(")"); e
      case t => throw new IllegalArgumentException(s"calc: unexpected token $t")
    }

    val ast = pExpr()
    if (toks.nonEmpty)
      throw new IllegalArgumentException(s"calc: trailing tokens $toks in: $formula")
    ast
  }

  // ---------------------------------------------------------- validator
  def varNames(ast: Ast): Set[String] = ast match {
    case Vari(n) => if (constants.contains(n)) Set.empty else Set(n)
    case Num(_) => Set.empty
    case Un(_, a) => varNames(a)
    case Bin(_, l, r) => varNames(l) ++ varNames(r)
    case Iff(c, t, f) => varNames(c) ++ varNames(t) ++ varNames(f)
    case Call(_, as) => as.flatMap(varNames).toSet
  }

  def funcNames(ast: Ast): Set[String] = ast match {
    case Call(f, as) => as.flatMap(funcNames).toSet + f
    case Un(_, a) => funcNames(a)
    case Bin(_, l, r) => funcNames(l) ++ funcNames(r)
    case Iff(c, t, f) => funcNames(c) ++ funcNames(t) ++ funcNames(f)
    case _ => Set.empty
  }

  private val validName = "^[a-zA-Z_][a-zA-Z0-9_]*$".r

  /** Analysis-time validation, mirroring
    * CalculatorConfig.validate_formula (calculator.py:168-188). */
  def validate(ast: Ast, inputVars: Set[String]): Unit = {
    inputVars.foreach { v =>
      if (validName.findFirstIn(v).isEmpty || constants.contains(v))
        throw new IllegalArgumentException(
          s"Invalid variable name: $v, must be an identifier and not in ${constants.keys.mkString(",")}")
    }
    val unknownVars = varNames(ast) -- inputVars
    if (unknownVars.nonEmpty)
      throw new IllegalArgumentException(s"Invalid variable names: $unknownVars")
    val unknownFns = funcNames(ast) -- functions
    if (unknownFns.nonEmpty)
      throw new IllegalArgumentException(s"Invalid function names: $unknownFns")
  }

  // ----------------------------------------------------------- compiler
  private def b01(c: Column): Column = when(c, 1.0).otherwise(0.0)
  private def truthy(c: Column): Column = c > 0.5

  def compile(ast: Ast, resolve: String => Column): Column = {
    def go(a: Ast): Column = a match {
      case Num(v) => lit(v)
      case Vari(n) => constants.get(n).map(lit).getOrElse(resolve(n))
      case Un("-", x) => -go(x)
      case Un("+", x) => go(x)
      case Un("!", x) => b01(!truthy(go(x)))
      case Un(o, _) => throw new IllegalArgumentException(s"calc: unary $o")
      case Bin(op, l, r) =>
        val (a, b) = (go(l), go(r))
        op match {
          case "+" => a + b
          case "-" => a - b
          case "*" => a * b
          case "/" => a / b
          case "%" => ((a % b) + b) % b // Python modulo: sign of divisor
          case "**" => pow(a, b)
          case "&" => b01(truthy(a) && truthy(b))
          case "|" => b01(truthy(a) || truthy(b))
          case "^" => b01(truthy(a) =!= truthy(b))
          case ">" => b01(a > b)
          case "<" => b01(a < b)
          case ">=" => b01(a >= b)
          case "<=" => b01(a <= b)
          case "==" => b01(a === b)
          case "!=" => b01(a =!= b)
          case o => throw new IllegalArgumentException(s"calc: binary $o")
        }
      case Iff(c, t, f) => when(truthy(go(c)), go(t)).otherwise(go(f))
      case Call(fn, args) =>
        val as = args.map(go)
        (fn, as) match {
          case ("sin", Seq(x)) => sin(x)
          case ("cos", Seq(x)) => cos(x)
          case ("tan", Seq(x)) => tan(x)
          case ("asin", Seq(x)) => asin(x)
          case ("acos", Seq(x)) => acos(x)
          case ("atan", Seq(x)) => atan(x)
          case ("atan2", Seq(y, x)) => atan2(y, x)
          case ("sinh", Seq(x)) => sinh(x)
          case ("cosh", Seq(x)) => cosh(x)
          case ("tanh", Seq(x)) => tanh(x)
          case ("asinh", Seq(x)) => asinh(x)
          case ("acosh", Seq(x)) => acosh(x)
          case ("atanh", Seq(x)) => atanh(x)
          case ("log", Seq(x)) => log(x)
          case ("log2", Seq(x)) => log2(x)
          case ("log10", Seq(x)) => log10(x)
          case ("exp", Seq(x)) => exp(x)
          case ("sqrt", Seq(x)) => sqrt(x)
          case ("floor", Seq(x)) => floor(x).cast("double")
          case ("ceil", Seq(x)) => ceil(x).cast("double")
          case ("round", Seq(x)) => bround(x).cast("double") // banker's
          case ("abs", Seq(x)) => abs(x)
          case ("min", xs) if xs.nonEmpty => least(xs: _*)
          case ("max", xs) if xs.nonEmpty => greatest(xs: _*)
          case (f, xs) => throw new IllegalArgumentException(
            s"calc: function $f with ${xs.length} args")
        }
    }
    go(ast)
  }

  /** Parse + validate + compile in one step. */
  def column(formula: String, vars: Map[String, Column]): Column = {
    val ast = parse(formula)
    validate(ast, vars.keySet)
    compile(ast, vars)
  }
}
